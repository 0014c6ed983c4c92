"""Edge-mode (sparse) ChebConvAttention / ASTGCN.

VERDICT r2 item 6: the reference scales per-edge norms by ``S[:, row, col]``
(``/root/reference/torch_geometric_temporal/nn/attention/astgcn.py:169-178``)
— here that becomes a gather of the attention at the sparse L̂'s edge pairs
feeding a weighted spmm, with NO (N, N) tensor on the large-graph path.
Edge mode must be numerically identical to the dense einsum mode given the
same attention matrix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_geometric_temporal_tpu.models.attention import (
    ASTGCN,
    ChebConvAttention,
    EdgeScores,
    SpatialAttentionSparse,
)
from pytorch_geometric_temporal_tpu.ops import Graph

N, E, F, C, B, T = 60, 240, 3, 5, 2, 4


@pytest.fixture
def setup(rng):
    ei = np.unique(rng.integers(0, N, size=(2, E)), axis=1)
    w = rng.uniform(0.5, 2.0, ei.shape[1]).astype(np.float32)
    g = Graph.from_edge_index(ei, w, num_nodes=N)
    x = jnp.asarray(rng.normal(size=(B, T, N, F)).astype(np.float32))
    s = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32)), axis=1
    )
    return g, x, s


@pytest.mark.parametrize("normalization", ["sym", None])
def test_edge_mode_matches_dense(setup, normalization):
    g, x, s = setup
    dense = ChebConvAttention(out_channels=C, K=3, normalization=normalization,
                              mode="dense")
    edge = ChebConvAttention(out_channels=C, K=3, normalization=normalization,
                             mode="edge")
    params = dense.init(jax.random.PRNGKey(0), x, g, s)
    want = dense.apply(params, x, g, s)
    got = edge.apply(params, x, g, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_edge_mode_matches_dense_under_jit(setup):
    g, x, s = setup
    edge = ChebConvAttention(out_channels=C, K=2, mode="edge")
    dense = ChebConvAttention(out_channels=C, K=2, mode="dense")
    params = edge.init(jax.random.PRNGKey(1), x, g, s)
    got = jax.jit(lambda p, xx, ss: edge.apply(p, xx, g, ss))(params, x, s)
    want = dense.apply(params, x, g, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_edge_scores_input_matches_dense_gather(setup):
    """EdgeScores (per-edge + diag) must reproduce the dense-S gather when
    the scores agree on the graph support and are zero elsewhere."""
    g, x, s_full = setup
    # sparse S: nonzero only on edges + diagonal
    e_scores = s_full[:, g.senders, g.receivers] * g.edge_mask()
    d_scores = jnp.einsum("bii->bi", s_full)
    s_sparse = jnp.zeros_like(s_full)
    s_sparse = s_sparse.at[:, g.senders, g.receivers].set(
        jnp.where(g.edge_mask() > 0, e_scores, 0.0)
    )
    idx = jnp.arange(N)
    s_sparse = s_sparse.at[:, idx, idx].set(d_scores)

    conv = ChebConvAttention(out_channels=C, K=3, mode="edge")
    params = conv.init(jax.random.PRNGKey(2), x, g, s_sparse)
    want = conv.apply(params, x, g, s_sparse)
    got = conv.apply(params, x, g, EdgeScores(edge=e_scores, diag=d_scores))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_spatial_attention_sparse_is_column_normalized(setup, rng):
    g, x, _ = setup
    xl = jnp.asarray(rng.normal(size=(B, N, F, T)).astype(np.float32))
    m = SpatialAttentionSparse(in_channels=F, num_of_timesteps=T)
    params = m.init(jax.random.PRNGKey(3), xl, g)
    scores = m.apply(params, xl, g)
    assert isinstance(scores, EdgeScores)
    # each column j's incident mass (edges into j + diagonal) sums to 1
    col = np.zeros((B, N))
    e_np = np.asarray(scores.edge)
    recv = np.asarray(g.receivers)
    mask = np.asarray(g.edge_mask())
    for b in range(B):
        np.add.at(col[b], recv, e_np[b] * mask)
    col += np.asarray(scores.diag)
    np.testing.assert_allclose(col, 1.0, atol=1e-5)
    assert np.all(np.asarray(scores.edge) >= 0)


def test_astgcn_edge_mode_runs_and_is_finite(setup):
    g, _, _ = setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, F, T)).astype(np.float32))
    m = ASTGCN(nb_block=2, in_channels=F, K=2, nb_chev_filter=4,
               nb_time_filter=4, time_strides=1, num_for_predict=3,
               len_input=T, num_of_vertices=N, attention_mode="edge")
    params = m.init(jax.random.PRNGKey(4), x, g)
    out = m.apply(params, x, g)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_astgcn_edge_mode_large_n():
    """N = 50k: the dense mode would need a ~10 GB (B, N, N) tensor per
    attention matrix; edge mode must run in O(E + N)."""
    n, e = 50_000, 200_000
    rng = np.random.default_rng(7)
    s_idx = rng.integers(0, n, size=e)
    r_idx = np.clip(s_idx + rng.integers(-64, 65, size=e), 0, n - 1)
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    g = Graph.from_edge_index(np.stack([s_idx, r_idx]), w, num_nodes=n)
    x = jnp.asarray(rng.normal(size=(1, n, 2, 4)).astype(np.float32))
    m = ASTGCN(nb_block=1, in_channels=2, K=2, nb_chev_filter=4,
               nb_time_filter=4, time_strides=1, num_for_predict=2,
               len_input=4, num_of_vertices=n, attention_mode="edge")
    params = m.init(jax.random.PRNGKey(5), x, g)
    out = m.apply(params, x, g)
    assert out.shape == (1, n, 2)
    assert np.isfinite(np.asarray(out)).all()
