"""Friendly shape errors + the raw-arrays dynamic-edge helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.signal import StackedSignal


def _graph(rng, n=12, e=40):
    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    return Graph.from_edge_index(ei, num_nodes=n)


def test_chebconv_names_layout(rng):
    from pytorch_geometric_temporal_tpu.models import GConvGRU

    g = _graph(rng)
    bad = jnp.zeros((5, 4))  # 5 != 12 nodes
    m = GConvGRU(out_channels=3, K=2)
    with pytest.raises(ValueError, match=r"\(\.\.\., N, F\).*node axis"):
        m.init(jax.random.PRNGKey(0), bad, g)


def test_gcnconv_names_layout(rng):
    from pytorch_geometric_temporal_tpu.models import TGCN

    g = _graph(rng)
    m = TGCN(out_channels=3)
    with pytest.raises(ValueError, match="GCNConv"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((7, 4)), g)


def test_dcrnn_names_layout(rng):
    from pytorch_geometric_temporal_tpu.models import DCRNN

    g = _graph(rng)
    with pytest.raises(ValueError, match="diffusion_basis"):
        DCRNN(out_channels=3, K=2).init(
            jax.random.PRNGKey(0), jnp.zeros((7, 4)), g
        )


def test_astgcn_checks_rank_nodes_and_T(rng):
    from pytorch_geometric_temporal_tpu.models import ASTGCN

    g = _graph(rng)
    kw = dict(nb_block=1, in_channels=2, K=2, nb_chev_filter=4,
              nb_time_filter=4, time_strides=1, num_for_predict=3,
              len_input=6, num_of_vertices=12, normalization="sym")
    m = ASTGCN(**kw)
    with pytest.raises(ValueError, match="rank"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((12, 2, 6)), g)
    with pytest.raises(ValueError, match="node axis"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 9, 2, 6)), g)
    with pytest.raises(ValueError, match="len_input"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 12, 2, 5)), g)


def test_gman_checks_embeddings(rng):
    from pytorch_geometric_temporal_tpu.models import GMAN

    m = GMAN(L=1, K=2, d=2, num_his=4, bn_decay=0.1, steps_per_day=8)
    x = jnp.zeros((2, 4, 10))
    te = jnp.zeros((2, 6, 2), jnp.int32)
    with pytest.raises(ValueError, match="SE"):
        m.init(jax.random.PRNGKey(0), x, jnp.zeros((10, 7)), te)
    with pytest.raises(ValueError, match="num_his"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 10)),
               jnp.zeros((10, 4)), te)


def test_agcrn_checks_embedding_shape(rng):
    from pytorch_geometric_temporal_tpu.models import AGCRN

    m = AGCRN(number_of_nodes=8, out_channels=3, K=2,
              embedding_dimensions=4)
    with pytest.raises(ValueError, match="node embeddings E"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 5)),
               jnp.zeros((8, 3)))
    with pytest.raises(ValueError, match=r"X \(\.\.\., N=8"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 5)),
               jnp.zeros((8, 4)))


def test_aagcn_checks_layout(rng):
    from pytorch_geometric_temporal_tpu.models import AAGCN

    ei = np.stack([np.arange(6), (np.arange(6) + 1) % 7])
    m = AAGCN(in_channels=3, out_channels=8,
              edge_index=tuple(map(tuple, ei)), num_nodes=7)
    with pytest.raises(ValueError, match=r"V=7"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 5, 9)))


def test_dense_only_models_guard_large_n(rng):
    """AVWGCN/AGCRN and ChebConvAttention are O(N²) by design — past any
    dense-sensible N they must refuse with an explanation, not OOM."""
    from pytorch_geometric_temporal_tpu.models import AGCRN
    from pytorch_geometric_temporal_tpu.models.attention.astgcn import (
        _lhat_dense,
    )

    n = 10_000
    m = AGCRN(number_of_nodes=n, out_channels=2, K=2, embedding_dimensions=3)
    with pytest.raises(ValueError, match="O\\(N²\\) memory"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, n, 2)),
               jnp.zeros((n, 3)))
    big = Graph.from_edge_index(
        np.stack([np.arange(n), (np.arange(n) + 1) % n]), num_nodes=n
    )
    with pytest.raises(ValueError, match="O\\(N²\\) memory"):
        _lhat_dense(big, "sym")


def test_host_edges_cache_is_read_only(rng):
    g = _graph(rng)
    s, r, w = g.host_edges()
    with pytest.raises(ValueError):
        s[0] = 99
    with pytest.raises(ValueError):
        w[0] = 99.0


# ---------------------------------------------------------------------------
# StackedSignal.from_arrays — dynamic-edge UX helper
# ---------------------------------------------------------------------------


def test_from_arrays_static(rng):
    T, n, f = 5, 10, 3
    ei = np.unique(rng.integers(0, n, size=(2, 30)), axis=1)
    feats = rng.normal(size=(T, n, f)).astype(np.float32)
    targs = rng.normal(size=(T, n)).astype(np.float32)
    sig = StackedSignal.from_arrays(feats, targs, ei)
    assert not sig.graph_dynamic
    assert sig.snapshot_count == T
    g = sig.graph()
    assert g.num_nodes == n

    def step(carry, x, y, graph):
        from pytorch_geometric_temporal_tpu.ops import spmm_segment

        return carry + spmm_segment(graph, x).sum(), ()

    total, _ = sig.scan(step, jnp.float32(0.0))
    assert np.isfinite(float(total))


def test_from_arrays_dynamic_ragged(rng):
    """Ragged per-step edge lists are padded internally — no pad_graphs."""
    T, n, f = 4, 8, 2
    eis = [np.unique(rng.integers(0, n, size=(2, e)), axis=1)
           for e in (10, 25, 17, 4)]
    ews = [rng.uniform(0.5, 1.0, ei.shape[1]).astype(np.float32)
           for ei in eis]
    feats = rng.normal(size=(T, n, f)).astype(np.float32)
    targs = rng.normal(size=(T, n)).astype(np.float32)
    sig = StackedSignal.from_arrays(feats, targs, eis, ews)
    assert sig.graph_dynamic
    assert sig.senders.shape[0] == T
    # all steps share one padded edge count
    assert sig.senders.shape[1] == max(ei.shape[1] for ei in eis)
    # per-step graphs match the raw edge lists (padding contributes zero)
    from pytorch_geometric_temporal_tpu.ops import spmm_segment

    x = jnp.asarray(feats[1])
    got = spmm_segment(sig.graph(1), x)
    g_raw = Graph.from_edge_index(eis[1], ews[1], num_nodes=n)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(spmm_segment(g_raw, x)),
                               rtol=1e-6)


def test_from_arrays_validates_lengths(rng):
    feats = np.zeros((3, 5, 2), np.float32)
    with pytest.raises(ValueError, match="steps"):
        StackedSignal.from_arrays(feats, np.zeros((2, 5), np.float32),
                                  np.zeros((2, 4), np.int32))
    with pytest.raises(ValueError, match="dynamic edge list"):
        StackedSignal.from_arrays(
            feats, np.zeros((3, 5), np.float32),
            [np.zeros((2, 4), np.int32)] * 2,
        )
