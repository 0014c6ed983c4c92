"""Tiled kernel path for dynamic-edge sequences (``stack_bcsr``).

Retires the old ``ops/spmm.py`` caveat ("dynamic per-step edge lists
inside a scan have no tiled path"): per-snapshot BCSR operators are
host-built, padded to uniform shapes, stacked with a leading T axis, and
scanned — one compiled kernel serves every step.  Verified against the
segment-path oracle per snapshot, including gradients through the scan.

Dynamic-graph pattern mirrors the reference's EnglandCovid loader
(``/root/reference/torch_geometric_temporal/dataset/encovid.py:28-40``):
edge sets drift snapshot to snapshot, sizes vary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.ops import (
    BCSRMatrix,
    Graph,
    bcsr_spmm,
    spmm_segment,
    stack_bcsr,
)

N, F, T = 600, 32, 5


def make_graphs(seed=0, n=N, t=T):
    """Drifting banded graphs with varying edge counts + random cross."""
    rng = np.random.default_rng(seed)
    graphs = []
    for ti in range(t):
        e = int(n * (6 + 3 * rng.random()))
        s = rng.integers(0, n, size=e)
        r = np.clip(s + rng.integers(-20, 21, size=e), 0, n - 1)
        # ~10% random cross edges (exercises the remainder path)
        cross = rng.random(e) < 0.1
        r[cross] = rng.integers(0, n, size=cross.sum())
        w = rng.uniform(0.1, 1.0, e).astype(np.float32)
        graphs.append(Graph.from_edge_index(np.stack([s, r]), w,
                                            num_nodes=n))
    return graphs


@pytest.fixture(scope="module")
def stacked():
    graphs = make_graphs()
    mats = [BCSRMatrix.from_graph(g, min_block_edges=16, pack=2)
            for g in graphs]
    return graphs, mats, stack_bcsr(mats)


def test_stacked_meta_uniform(stacked):
    graphs, mats, st = stacked
    assert st.fwd.blocks.shape[0] == T
    assert st.fwd.nnzb == max(m.fwd.nnzb for m in mats)
    assert st.fwd.num_rem == max(m.fwd.num_rem for m in mats)


def test_scan_matches_segment_oracle(stacked):
    graphs, mats, st = stacked
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    @jax.jit
    def scan_all(x0, st):
        def step(h, mat_t):
            out = bcsr_spmm(mat_t, h, use_pallas=False)
            return h, out  # keep input fixed; collect per-step outputs

        _, outs = jax.lax.scan(step, x0, st)
        return outs

    outs = scan_all(x, st)
    assert outs.shape == (T, N, F)
    for ti, g in enumerate(graphs):
        want = spmm_segment(g, x)
        np.testing.assert_allclose(np.asarray(outs[ti]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_scan_matches_per_snapshot_operator(stacked):
    """Slicing the stack reproduces each unstacked operator's output."""
    graphs, mats, st = stacked
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    sliced = jax.tree_util.tree_map(lambda a: a[3], st)
    out_stacked = bcsr_spmm(sliced, x, use_pallas=False)
    out_single = bcsr_spmm(mats[3], x, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_stacked),
                               np.asarray(out_single), rtol=1e-6, atol=1e-6)


def test_gradients_through_stacked_scan(stacked):
    graphs, mats, st = stacked
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    @jax.jit
    def loss_scan(x0, st):
        def step(h, mat_t):
            return jnp.tanh(bcsr_spmm(mat_t, h, use_pallas=False)), None

        h, _ = jax.lax.scan(step, x0, st)
        return (h ** 2).sum()

    def loss_loop(x0):
        h = x0
        for g in graphs:
            h = jnp.tanh(spmm_segment(g, h))
        return (h ** 2).sum()

    g_scan = jax.grad(loss_scan)(x, st)
    g_loop = jax.grad(loss_loop)(x)
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_loop),
                               rtol=5e-4, atol=5e-5)


def test_pallas_interpret_matches_xla(stacked):
    """The Pallas kernel path (interpret mode on CPU) over a stacked slice."""
    from pytorch_geometric_temporal_tpu.ops.bcsr import _bcsr_matmul_pallas

    graphs, mats, st = stacked
    rng = np.random.default_rng(4)
    sliced = jax.tree_util.tree_map(lambda a: a[1], st)
    x = jnp.asarray(rng.normal(size=(sliced.fwd.num_rows, F))
                    .astype(np.float32))
    out_k = _bcsr_matmul_pallas(sliced.fwd, x, interpret=True)
    want = spmm_segment(graphs[1], x[:N])
    np.testing.assert_allclose(np.asarray(out_k[:N]), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stack_bcsr_validation():
    g1 = make_graphs(seed=5, n=128, t=1)[0]
    g2 = make_graphs(seed=6, n=256, t=1)[0]
    m1 = BCSRMatrix.from_graph(g1, pack=2)
    m2 = BCSRMatrix.from_graph(g2, pack=2)
    with pytest.raises(ValueError, match="num_nodes"):
        stack_bcsr([m1, m2])
    m1b = BCSRMatrix.from_graph(g1, pack=4)
    with pytest.raises(ValueError, match="pack"):
        stack_bcsr([m1, m1b])
    m1bf16 = BCSRMatrix.from_graph(g1, pack=2, dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="dtype"):
        stack_bcsr([m1, m1bf16])
    g3 = make_graphs(seed=9, n=128, t=1)[0]
    m_rk1 = BCSRMatrix.from_graph(g3, pack=2, min_block_edges=1000)
    m_rk2 = BCSRMatrix.from_graph(g3, pack=2, min_block_edges=1000,
                                  rem_k=256)
    if m_rk1.fwd.num_rem and m_rk2.fwd.num_rem:
        with pytest.raises(ValueError, match="rem_k"):
            stack_bcsr([m_rk1, m_rk2])
    with pytest.raises(ValueError, match="at least one"):
        stack_bcsr([])


def test_evolvegcno_seq_over_stacked_operator():
    """EvolveGCNOSeq runs the tiled operator path for dynamic sequences.

    The stacked prenormalized operator (``stack_bcsr_gcn``) must produce
    the same sequence output as the same model over the stacked dynamic
    Graph (segment path, in-trace gcn_norm).
    """
    from pytorch_geometric_temporal_tpu.models import EvolveGCNOSeq
    from pytorch_geometric_temporal_tpu.ops import stack_bcsr_gcn, stack_graphs

    graphs = make_graphs(seed=7, n=200, t=4)
    rng = np.random.default_rng(8)
    f = 8
    xs = jnp.asarray(rng.normal(size=(4, 200, f)).astype(np.float32))

    ref_model = EvolveGCNOSeq(in_channels=f)
    params = ref_model.init(jax.random.PRNGKey(0), xs, stack_graphs(graphs))
    want = ref_model.apply(params, xs, stack_graphs(graphs))

    ops = stack_bcsr_gcn(graphs, min_block_edges=16, pack=2)
    op_model = EvolveGCNOSeq(in_channels=f, normalize=False)
    got = op_model.apply(params, xs, ops)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    with pytest.raises(ValueError, match="normalize=False"):
        EvolveGCNOSeq(in_channels=f).apply(params, xs, ops)


def test_evolvegcnh_seq_over_stacked_operator():
    """EvolveGCNHSeq runs the tiled operator path for dynamic sequences.

    H-variant analogue of the O-variant test above: the stacked
    prenormalized operator must reproduce the stacked-dynamic-Graph
    (segment path) sequence output bit-for-tolerance.
    """
    from pytorch_geometric_temporal_tpu.models import EvolveGCNHSeq
    from pytorch_geometric_temporal_tpu.ops import stack_bcsr_gcn, stack_graphs

    n, t, f = 200, 4, 8
    graphs = make_graphs(seed=11, n=n, t=t)
    rng = np.random.default_rng(12)
    xs = jnp.asarray(rng.normal(size=(t, n, f)).astype(np.float32))

    ref_model = EvolveGCNHSeq(num_of_nodes=n, in_channels=f)
    params = ref_model.init(jax.random.PRNGKey(0), xs, stack_graphs(graphs))
    want = ref_model.apply(params, xs, stack_graphs(graphs))

    ops = stack_bcsr_gcn(graphs, min_block_edges=16, pack=2)
    op_model = EvolveGCNHSeq(num_of_nodes=n, in_channels=f, normalize=False)
    got = op_model.apply(params, xs, ops)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    with pytest.raises(ValueError, match="normalize=False"):
        EvolveGCNHSeq(num_of_nodes=n, in_channels=f).apply(params, xs, ops)
