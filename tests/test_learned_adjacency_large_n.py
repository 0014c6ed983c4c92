"""Large-N story for the dense-by-construction learned-adjacency models.

AGCRN/AVWGCN (reference ``nn/recurrent/agcrn.py:7-53``) and MTGNN's
GraphConstructor (reference ``nn/attention/mtgnn.py``) learn dense (N, N)
adjacencies.  Round-3 VERDICT #10: friendly guards + a top-k-sparsified
option so no silent O(N²) surprises.

- AVWGCN(topk=k) never materializes (N, N): chunked top-k selection +
  vector-form Chebyshev recursion.  With k = N (keep everything) and
  non-negative scores it must EXACTLY match the dense math modulo the
  documented softmax deviation — we verify the stronger statement that
  the supports coincide when every entry is kept and relu zeroes none.
- Guards raise with actionable messages past 8192 nodes.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.models.conv import AVWGCN, _topk_support


def test_topk_support_matches_dense_when_full():
    """k=N and all-positive scores ⇒ sparse support == dense support."""
    rng = np.random.default_rng(0)
    n, d = 24, 6
    e = jnp.asarray(np.abs(rng.normal(size=(n, d))).astype(np.float32))
    # all-positive embeddings ⇒ relu(E Eᵀ) has no zeros ⇒ softmax over
    # kept == softmax over all
    cols, vals = _topk_support(e, k=n, chunk=7)
    dense = jax.nn.softmax(jax.nn.relu(e @ e.T), axis=1)
    got = np.zeros((n, n), np.float32)
    got[np.arange(n)[:, None], np.asarray(cols)] = np.asarray(vals)
    np.testing.assert_allclose(got, np.asarray(dense), rtol=1e-5, atol=1e-6)


def test_avwgcn_topk_full_matches_dense():
    rng = np.random.default_rng(1)
    n, d, f, k_cheb = 24, 6, 5, 3
    e = jnp.asarray(np.abs(rng.normal(size=(n, d))).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, n, f)).astype(np.float32))
    dense = AVWGCN(out_channels=4, K=k_cheb, embedding_dimensions=d)
    sparse = AVWGCN(out_channels=4, K=k_cheb, embedding_dimensions=d, topk=n)
    params = dense.init(jax.random.PRNGKey(0), x, e)
    out_d = dense.apply(params, x, e)
    out_s = sparse.apply(params, x, e)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=2e-4, atol=2e-5)


def test_avwgcn_topk_large_n_runs_and_trains():
    """N far past the dense guard runs in the sparse mode, with gradients."""
    rng = np.random.default_rng(2)
    n, d, f = 20_000, 4, 3
    e = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    model = AVWGCN(out_channels=4, K=2, embedding_dimensions=d, topk=8)
    params = model.init(jax.random.PRNGKey(0), x, e)

    @jax.jit
    def loss(p, e):
        return (model.apply(p, x, e) ** 2).mean()

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, e)
    assert np.isfinite(float(val))
    # gradients reach both the pooled weights and the embeddings
    g_norm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()), grads[0], 0.0
    )
    assert g_norm > 0.0
    assert float(jnp.abs(grads[1]).sum()) > 0.0


def test_avwgcn_dense_guard_message():
    e = jnp.zeros((9000, 4))
    x = jnp.zeros((9000, 3))
    model = AVWGCN(out_channels=4, K=2, embedding_dimensions=4)
    with pytest.raises(ValueError, match=r"topk=16"):
        model.init(jax.random.PRNGKey(0), x, e)


def test_agcrn_topk_passthrough():
    from pytorch_geometric_temporal_tpu.models import AGCRN

    rng = np.random.default_rng(3)
    n, d, f = 100, 4, 3
    e = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, n, f)).astype(np.float32))
    m = AGCRN(number_of_nodes=n, out_channels=8, K=2,
              embedding_dimensions=d, topk=5)
    params = m.init(jax.random.PRNGKey(0), x, e)
    h = m.apply(params, x, e)
    assert h.shape == (2, n, 8)
    assert np.isfinite(np.asarray(h)).all()


def test_mtgnn_constructor_guard():
    from pytorch_geometric_temporal_tpu.models.attention.mtgnn import (
        GraphConstructor,
    )

    n = 9000
    gc = GraphConstructor(nnodes=n, k=16, dim=4, alpha=3.0)
    idx = jnp.arange(n)
    with pytest.raises(ValueError, match=re.escape("subgraph")):
        gc.init(jax.random.PRNGKey(0), idx)
