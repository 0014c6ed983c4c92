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
    """Wide feature matrix forces multiple F tiles; interpret-mode check."""
    g = make_graph(rng, 300, 1500)
    mat = BCSRMatrix.from_graph(g)
    x = jnp.asarray(
        rng.normal(size=(mat.fwd.num_cols, 700)).astype(np.float32)
    )
    want = _bcsr_matmul_xla_ref(mat, jnp.pad(x, ((0, 0), (0, 0))))
    got = _bcsr_matmul_pallas(mat.fwd, x, interpret=True, f_tile=256)
    np.testing.assert_allclose(got, want[:, :700], atol=1e-3)


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
