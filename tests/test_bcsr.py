"""BCSR block-sparse SpMM tests (XLA path + Pallas kernel in interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.ops import Graph, spmm_segment
from pytorch_geometric_temporal_tpu.ops.bcsr import (
    BCSRMatrix,
    _bcsr_matmul_pallas,
    bcsr_spmm,
)


def make_graph(rng, n, e):
    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    w = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=n)


@pytest.mark.parametrize("n,e", [(50, 300), (200, 1500), (300, 900)])
def test_bcsr_matches_segment(rng, n, e):
    g = make_graph(rng, n, e)
    mat = BCSRMatrix.from_graph(g)
    x = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    want = spmm_segment(g, x)
    got = bcsr_spmm(mat, x, use_pallas=False)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bcsr_pallas_interpret(rng):
    g = make_graph(rng, 300, 2000)
    mat = BCSRMatrix.from_graph(g)
    x = jnp.asarray(rng.normal(size=(mat.fwd.num_cols, 32)).astype(np.float32))
    want = _bcsr_matmul_xla_ref(mat, x)
    got = _bcsr_matmul_pallas(mat.fwd, x, interpret=True)
    np.testing.assert_allclose(got, want, atol=1e-3)


def _bcsr_matmul_xla_ref(mat, x):
    from pytorch_geometric_temporal_tpu.ops.bcsr import _bcsr_matmul_xla

    return _bcsr_matmul_xla(mat.fwd, x)


def test_bcsr_gradient(rng):
    g = make_graph(rng, 100, 600)
    mat = BCSRMatrix.from_graph(g)
    x = jnp.asarray(rng.normal(size=(100, 5)).astype(np.float32))

    def f(x_):
        return (bcsr_spmm(mat, x_, use_pallas=False) ** 2).sum()

    def f_ref(x_):
        return (spmm_segment(g, x_) ** 2).sum()

    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x), atol=1e-3)


def test_bcsr_batched(rng):
    g = make_graph(rng, 60, 250)
    mat = BCSRMatrix.from_graph(g)
    x = jnp.asarray(rng.normal(size=(3, 60, 4)).astype(np.float32))
    got = bcsr_spmm(mat, x, use_pallas=False)
    for b in range(3):
        np.testing.assert_allclose(got[b], spmm_segment(g, x[b]), atol=1e-4)


def test_bcsr_density(rng):
    g = make_graph(rng, 1000, 3000)
    mat = BCSRMatrix.from_graph(g)
    assert 0 < mat.density <= 1.0
    assert mat.fwd.num_rows % 128 == 0


def test_bcsr_pallas_f_tiling(rng):
    """Wide feature matrix forces multiple F tiles; interpret-mode check.

    min_block_edges=0 so ALL edges land in dense tiles — this compares the
    raw kernel (no COO remainder) against the block einsum."""
    g = make_graph(rng, 300, 1500)
    mat = BCSRMatrix.from_graph(g, min_block_edges=0)
    x = jnp.asarray(
        rng.normal(size=(mat.fwd.num_cols, 700)).astype(np.float32)
    )
    want = _bcsr_matmul_xla_ref(mat, jnp.pad(x, ((0, 0), (0, 0))))
    got = _bcsr_matmul_pallas(mat.fwd, x, interpret=True, f_tile=256)
    np.testing.assert_allclose(got, want[:, :700], atol=1e-3)


def test_bcsr_hybrid_split(rng):
    """Default threshold spills sparse-block edges to the COO remainder;
    result still matches the segment oracle, and fewer tiles materialize."""
    g = make_graph(rng, 2000, 4000)  # sparse random graph → sparse blocks
    mat_all = BCSRMatrix.from_graph(g, min_block_edges=0)
    mat_hyb = BCSRMatrix.from_graph(g)  # default threshold 32
    assert mat_hyb.fwd.num_rem > 0
    assert mat_hyb.fwd.nnzb < mat_all.fwd.nnzb
    x = jnp.asarray(rng.normal(size=(2000, 6)).astype(np.float32))
    want = spmm_segment(g, x)
    np.testing.assert_allclose(bcsr_spmm(mat_hyb, x, use_pallas=False),
                               want, atol=1e-4)

    # gradients flow through both the block and remainder paths
    def f(x_):
        return (bcsr_spmm(mat_hyb, x_, use_pallas=False) ** 2).sum()

    def f_ref(x_):
        return (spmm_segment(g, x_) ** 2).sum()

    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x), atol=1e-3)


def test_bcsr_hybrid_pallas_interpret(rng):
    """The remainder SCATTER KERNEL (one-hot MXU matmul over row-block
    chunks, aliased over the tile output) must match the segment oracle —
    interpret-mode check of the full hybrid pallas path."""
    g = make_graph(rng, 900, 2500)  # sparse → real remainder
    mat = BCSRMatrix.from_graph(g)  # default threshold 32
    assert mat.fwd.num_rem > 0
    x = jnp.asarray(rng.normal(size=(mat.fwd.num_cols, 20)).astype(np.float32))
    want = _bcsr_matmul_xla_ref(mat, x)
    got = _bcsr_matmul_pallas(mat.fwd, x, interpret=True)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_bcsr_all_spill_pallas_interpret(rng):
    """Pure-COO operator (zero tiles) through the pallas path: dummy steps
    zero-define every row block, scatter kernel adds everything."""
    g = make_graph(rng, 500, 900)
    mat = BCSRMatrix.from_graph(g, min_block_edges=10**6)
    x = jnp.asarray(rng.normal(size=(mat.fwd.num_cols, 8)).astype(np.float32))
    got = _bcsr_matmul_pallas(mat.fwd, x, interpret=True)
    want = np.zeros((mat.fwd.num_rows, 8), np.float32)
    want[:500] = np.asarray(spmm_segment(g, x[:500]))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_bcsr_rem_chunking(rng):
    """Remainder chunk invariants: padded vals are zero, lrows in range,
    chunk row blocks sorted, real edge count preserved."""
    g = make_graph(rng, 2000, 4000)
    mat = BCSRMatrix.from_graph(g)
    h = mat.fwd
    assert h.num_rem > 0
    vals = np.asarray(h.rem_vals)
    lrows = np.asarray(h.rem_lrows)
    rb = np.asarray(h.rem_step_rb)
    assert (np.count_nonzero(vals)) == h.num_rem
    assert lrows.min() >= 0 and lrows.max() < 128
    assert (np.diff(rb) >= 0).all()
    # derived global rows land inside each chunk's row block
    rows = np.asarray(h.rem_rows).reshape(len(rb), -1)
    assert ((rows // 128) == rb[:, None]).all()


def test_bcsr_matrix_as_jit_argument(rng):
    """BCSRMatrix must pass through jit as a pytree ARGUMENT (not closure):
    closure constants bake GB-scale blocks into the HLO."""
    g = make_graph(rng, 200, 1200)
    mat = BCSRMatrix.from_graph(g)
    x = jnp.asarray(rng.normal(size=(200, 5)).astype(np.float32))

    @jax.jit
    def apply(m, xx):
        return bcsr_spmm(m, xx, use_pallas=False)

    np.testing.assert_allclose(apply(mat, x), spmm_segment(g, x), atol=1e-4)

    @jax.jit
    def grad_through(m, xx):
        return jax.grad(lambda x_: (bcsr_spmm(m, x_, use_pallas=False) ** 2).sum())(xx)

    g_ref = jax.grad(lambda x_: (spmm_segment(g, x_) ** 2).sum())(x)
    np.testing.assert_allclose(grad_through(mat, x), g_ref, atol=1e-3)


def test_bcsr_bf16_blocks(rng):
    g = make_graph(rng, 100, 600)
    mat32 = BCSRMatrix.from_graph(g)
    mat16 = BCSRMatrix.from_graph(g, dtype=jnp.bfloat16)
    assert mat16.fwd.blocks.dtype == jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(100, 8)).astype(np.float32))
    a = bcsr_spmm(mat32, x, use_pallas=False)
    b = bcsr_spmm(mat16, x, use_pallas=False)
    rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
    assert rel < 2e-2  # bf16 tile rounding


def test_bcsr_uncovered_rows_masked(rng):
    """Row blocks never visited by a tile must come back ZERO from the
    pallas path (the kernel only zero-inits tiles it visits; uncovered ones
    are undefined memory on real TPU — regression for the hybrid split
    where most rows live in the remainder)."""
    # single edge -> one tile; all other row blocks uncovered
    g = Graph.from_edge_index(
        np.array([[700], [700]]), np.array([2.0], np.float32), num_nodes=900
    )
    mat = BCSRMatrix.from_graph(g, min_block_edges=0)
    x = jnp.asarray(rng.normal(size=(mat.fwd.num_cols, 8)).astype(np.float32))
    out = _bcsr_matmul_pallas(mat.fwd, x, interpret=True)
    want = np.zeros((mat.fwd.num_rows, 8), np.float32)
    want[700] = 2.0 * np.asarray(x)[700]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_bcsr_all_spill(rng):
    """min_block_edges above every block count spills ALL edges: zero real
    tiles remain and the result is pure COO (dummy steps still zero-define
    every row block on the kernel path)."""
    g = make_graph(rng, 500, 900)
    mat = BCSRMatrix.from_graph(g, min_block_edges=10**6)
    assert mat.fwd.nnzb == 0 and mat.fwd.num_rem == g.num_edges
    assert mat.fwd.block_rows.shape == (0,) and mat.fwd.block_cols.shape == (0,)
    x = jnp.asarray(rng.normal(size=(500, 8)).astype(np.float32))
    np.testing.assert_allclose(
        bcsr_spmm(mat, x, use_pallas=False), spmm_segment(g, x), atol=1e-4
    )

    def f(x_):
        return (bcsr_spmm(mat, x_, use_pallas=False) ** 2).sum()

    g_ref = jax.grad(lambda x_: (spmm_segment(g, x_) ** 2).sum())(x)
    np.testing.assert_allclose(jax.grad(f)(x), g_ref, atol=1e-3)


# ---------------------------------------------------------------------------
# reorder= (RCM bandwidth reduction)
# ---------------------------------------------------------------------------


def _scrambled_banded(rng, n=900, e=8000, width=12):
    """Banded graph whose node ids are randomly scrambled — the case
    reordering exists for (arbitrary sensor ids over a local network)."""
    s = rng.integers(0, n, size=e)
    r = np.clip(s + rng.integers(-width, width + 1, size=e), 0, n - 1)
    scram = rng.permutation(n)
    ei = np.unique(np.stack([scram[s], scram[r]]), axis=1)
    w = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=n)


def test_reorder_rcm_matches_segment(rng):
    g = _scrambled_banded(rng)
    mat = BCSRMatrix.from_graph(g, reorder="rcm", min_block_edges=8)
    assert mat.perm is not None and mat.iperm is not None
    # the permutation round-trips
    np.testing.assert_array_equal(
        np.asarray(mat.perm)[np.asarray(mat.iperm)],
        np.arange(mat.fwd.num_rows),
    )
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 9)).astype(np.float32))
    want = spmm_segment(g, x)
    got = bcsr_spmm(mat, x, use_pallas=False)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_reorder_rcm_reduces_remainder(rng):
    # large enough that scrambled ids actually spray the band across many
    # blocks (a 900-node graph only has an 8x8 tile grid — every tile
    # stays dense no matter the ordering)
    g = _scrambled_banded(rng, n=5000, e=40000, width=15)
    plain = BCSRMatrix.from_graph(g, min_block_edges="auto")
    rcm = BCSRMatrix.from_graph(g, reorder="rcm", min_block_edges="auto")
    # scrambled ids spray the band across blocks; RCM recovers it
    assert rcm.fwd.num_rem < plain.fwd.num_rem / 2


def test_reorder_gradient(rng):
    g = _scrambled_banded(rng, n=400, e=3000)
    mat = BCSRMatrix.from_graph(g, reorder="rcm", min_block_edges=8)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 5)).astype(np.float32))

    def f(x_):
        return (bcsr_spmm(mat, x_, use_pallas=False) ** 2).sum()

    def f_ref(x_):
        return (spmm_segment(g, x_) ** 2).sum()

    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x),
                               rtol=1e-3, atol=1e-3)


def test_reorder_auto_declines_when_ordering_is_already_good(rng):
    # an already-banded graph: relabeling cannot beat identity once the
    # per-call gather price is charged
    n, e = 900, 8000
    s = rng.integers(0, n, size=e)
    r = np.clip(s + rng.integers(-12, 13, size=e), 0, n - 1)
    ei = np.unique(np.stack([s, r]), axis=1)
    g = Graph.from_edge_index(ei, num_nodes=n)
    mat = BCSRMatrix.from_graph(g, reorder="auto", min_block_edges="auto")
    assert mat.perm is None


def test_reorder_auto_accepts_scrambled(rng):
    g = _scrambled_banded(rng)
    mat = BCSRMatrix.from_graph(g, reorder="auto", min_block_edges="auto")
    assert mat.perm is not None


def test_reorder_validation(rng):
    g = _scrambled_banded(rng, n=300, e=1500)
    with pytest.raises(ValueError, match="reorder"):
        BCSRMatrix.from_graph(g, reorder="bogus")


def test_stack_bcsr_rejects_mixed_reorder(rng):
    from pytorch_geometric_temporal_tpu.ops import stack_bcsr

    g = _scrambled_banded(rng, n=300, e=1500)
    plain = BCSRMatrix.from_graph(g, pack=2)
    rcm = BCSRMatrix.from_graph(g, reorder="rcm", pack=2)
    with pytest.raises(ValueError, match="reorder"):
        stack_bcsr([plain, rcm])


def test_stack_bcsr_with_reorder_matches(rng):
    from pytorch_geometric_temporal_tpu.ops import stack_bcsr

    graphs = [_scrambled_banded(rng, n=300, e=1500) for _ in range(3)]
    mats = [BCSRMatrix.from_graph(g, reorder="rcm", pack=2,
                                  min_block_edges=8) for g in graphs]
    st = stack_bcsr(mats)
    x = jnp.asarray(rng.normal(size=(300, 6)).astype(np.float32))
    for t, g in enumerate(graphs):
        sliced = jax.tree_util.tree_map(lambda a: a[t], st)
        got = bcsr_spmm(sliced, x, use_pallas=False)
        np.testing.assert_allclose(got, spmm_segment(g, x), atol=1e-4)


def test_closed_over_operator_warns(rng, monkeypatch):
    """A large operator closed over inside jit warns once (the HLO-constant
    compile-blow-up footgun, benchmarks/compile_bisect.py).  Exercises the
    REAL check — only the size threshold (a module constant kept patchable
    for exactly this purpose) is lowered so a test-sized operator
    qualifies."""
    import warnings as _w

    from pytorch_geometric_temporal_tpu.ops import bcsr
    monkeypatch.setattr(bcsr, "_warned_closed_over", False)
    monkeypatch.setattr(bcsr, "_CLOSED_OVER_WARN_BYTES", 0)

    g = make_graph(rng, 300, 2000)
    mat = BCSRMatrix.from_graph(g)
    x = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))

    with pytest.warns(UserWarning, match="closed over inside a trace"):
        jax.jit(lambda a: bcsr_spmm(mat, a, use_pallas=False))(x)
    # the warning is one-time
    assert bcsr._warned_closed_over
    # operand style must NOT warn (the operator rides as a tracer)
    monkeypatch.setattr(bcsr, "_warned_closed_over", False)
    with _w.catch_warnings():
        _w.simplefilter("error")
        jax.jit(lambda a, m: bcsr_spmm(m, a, use_pallas=False))(x, mat)
    # auto-built operators (spmm auto-dispatch) are exempt by design
    monkeypatch.setattr(bcsr, "_warned_closed_over", False)
    mat2 = BCSRMatrix.from_graph(g)
    object.__setattr__(mat2, "_auto_built", True)
    with _w.catch_warnings():
        _w.simplefilter("error")
        jax.jit(lambda a: bcsr_spmm(mat2, a, use_pallas=False))(x)


def test_reorder_graph_model_level(rng):
    """The model-level reordering pattern: run everything in permuted
    space, permute features in once and outputs back once — equal to the
    original-space run.  This is the per-forward-cost-once alternative to
    BCSRMatrix(reorder=...)'s per-spmm gathers."""
    from pytorch_geometric_temporal_tpu.ops import reorder_graph

    n = 600
    s = rng.integers(0, n, 4000)
    r = np.clip(s + rng.integers(-10, 11, 4000), 0, n - 1)
    scram = rng.permutation(n)
    ei = np.unique(np.stack([scram[s], scram[r]]), axis=1)
    w = rng.uniform(0.5, 2.0, ei.shape[1]).astype(np.float32)
    g = Graph.from_edge_index(ei, w, num_nodes=n)

    g2, perm, iperm = reorder_graph(g)
    np.testing.assert_array_equal(perm[iperm], np.arange(n))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    # two hops in permuted space (a mini recurrent model's aggregations)
    want = spmm_segment(g, jnp.tanh(spmm_segment(g, x)))
    out_p = spmm_segment(g2, jnp.tanh(spmm_segment(g2, x[perm])))
    np.testing.assert_allclose(np.asarray(out_p[iperm]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_reorder_graph_validation(rng):
    from pytorch_geometric_temporal_tpu.ops import reorder_graph

    ei = np.stack([rng.integers(0, 50, 100), rng.integers(0, 30, 100)])
    bip = Graph.from_edge_index(ei, num_nodes=30, num_src=50)
    with pytest.raises(ValueError, match="square"):
        reorder_graph(bip)


@pytest.mark.parametrize("seed", range(4))
def test_bcsr_config_fuzz_matches_segment(seed):
    """Random (graph shape x pack x rem_k x dtype x threshold x reorder)
    configurations all reproduce the segment oracle — a broad regression
    net over the construction parameter space."""
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(150, 1200))
    e = int(rng.integers(2, 12)) * n
    style = rng.choice(["uniform", "banded", "scrambled-banded"])
    s = rng.integers(0, n, e)
    if style == "uniform":
        r = rng.integers(0, n, e)
    else:
        r = np.clip(s + rng.integers(-15, 16, e), 0, n - 1)
        if style == "scrambled-banded":
            p = rng.permutation(n)
            s, r = p[s], p[r]
    ei = np.unique(np.stack([s, r]), axis=1)
    w = rng.uniform(0.1, 2.0, ei.shape[1]).astype(np.float32)
    g = Graph.from_edge_index(ei, w, num_nodes=n)

    pack = int(rng.choice([1, 2, 4]))
    rem_k = int(rng.choice([64, 128]))
    mbe = rng.choice(["auto", 0, 8, 64])
    mbe = mbe if mbe == "auto" else int(mbe)
    dtype = rng.choice([None, "bf16"])
    reorder = rng.choice([None, "rcm", "auto"])
    mat = BCSRMatrix.from_graph(
        g, pack=pack, rem_k=rem_k, min_block_edges=mbe,
        dtype=jnp.bfloat16 if dtype == "bf16" else None,
        reorder=reorder,
    )
    f = int(rng.integers(3, 40))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(bcsr_spmm(mat, x, use_pallas=False))
    tol = 3e-2 * np.abs(want).max() if dtype == "bf16" else 1e-4
    np.testing.assert_allclose(got, want, atol=max(tol, 1e-4)), (
        style, pack, rem_k, mbe, dtype, reorder)
