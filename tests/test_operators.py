"""Prenormalized-operator tests: host norms must match the in-trace jnp
norms bit-for-bit (up to edge order → compared via dense adjacency), and
models must accept the wrappers wherever they accept a Graph.

Reference counterpart: PyG's ``cached=True`` norm caching; here the cache is
an explicit host-built pytree (ops/operators.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.ops import (
    DiffusionOperators,
    Graph,
    Prenormalized,
    cheb_norm,
    diffusion_norms,
    gcn_norm,
    host_cheb_norm,
    host_diffusion_norms,
    host_gcn_norm,
    prenormalize_cheb,
    prenormalize_gcn,
    spmm_segment,
)
from pytorch_geometric_temporal_tpu.models.conv import GCNConv, cheb_basis
from pytorch_geometric_temporal_tpu.models.recurrent.dcrnn import (
    DCRNN,
    diffusion_basis,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def make_graph(rng, n, e):
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    w = rng.uniform(0.1, 2.0, size=e).astype(np.float32)
    return Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n)


def dense(g):
    return np.asarray(g.to_adj())


def test_host_gcn_norm_matches(rng):
    g = make_graph(rng, 60, 300)
    for improved in (False, True):
        for loops in (True, False):
            want = dense(gcn_norm(g, improved, loops))
            got = dense(host_gcn_norm(g, improved, loops))
            np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("normalization", ["sym", "rw", None])
def test_host_cheb_norm_matches(rng, normalization):
    g = make_graph(rng, 50, 240)
    for lmax in (None, 1.7):
        want = dense(cheb_norm(g, normalization, lmax))
        got = dense(host_cheb_norm(g, normalization, lmax))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_host_diffusion_norms_match(rng):
    g = make_graph(rng, 40, 200)
    wf, wb = diffusion_norms(g)
    gf, gb = host_diffusion_norms(g)
    np.testing.assert_allclose(dense(gf), dense(wf), atol=1e-6)
    np.testing.assert_allclose(dense(gb), dense(wb), atol=1e-6)


def test_cheb_basis_prenormalized(rng):
    g = make_graph(rng, 30, 150)
    x = jnp.asarray(rng.normal(size=(30, 4)).astype(np.float32))
    want = cheb_basis(g, x, K=3)
    pre = prenormalize_cheb(g)
    assert isinstance(pre, Prenormalized)
    got = cheb_basis(pre, x, K=3)
    np.testing.assert_allclose(got, want, atol=1e-4)
    # BCSR-backed variant (XLA path on CPU)
    pre_b = prenormalize_cheb(g, bcsr=True, min_block_edges=0)
    np.testing.assert_allclose(cheb_basis(pre_b, x, K=3), want, atol=1e-4)


def test_gcnconv_prenormalized(rng):
    g = make_graph(rng, 30, 150)
    x = jnp.asarray(rng.normal(size=(30, 4)).astype(np.float32))
    m_ref = GCNConv(out_channels=5)
    params = m_ref.init(jax.random.PRNGKey(0), x, g)
    want = m_ref.apply(params, x, g)
    m_pre = GCNConv(out_channels=5, normalize=False)
    op = prenormalize_gcn(g)
    np.testing.assert_allclose(m_pre.apply(params, x, op), want, atol=1e-4)
    op_b = prenormalize_gcn(g, bcsr=True)
    np.testing.assert_allclose(m_pre.apply(params, x, op_b), want, atol=1e-4)


def test_diffusion_basis_operators(rng):
    g = make_graph(rng, 30, 150)
    x = jnp.asarray(rng.normal(size=(30, 4)).astype(np.float32))
    want = diffusion_basis(g, x, K=3)
    ops = DiffusionOperators.from_graph(g)
    np.testing.assert_allclose(diffusion_basis(ops, x, K=3), want, atol=1e-4)
    ops_b = DiffusionOperators.from_graph(g, bcsr=True)
    np.testing.assert_allclose(diffusion_basis(ops_b, x, K=3), want, atol=1e-4)


def test_dcrnn_with_prebuilt_operators(rng):
    """Full cell forward + grad through a jitted step with the operator as a
    pytree argument."""
    g = make_graph(rng, 24, 120)
    x = jnp.asarray(rng.normal(size=(24, 3)).astype(np.float32))
    cell = DCRNN(out_channels=6, K=2)
    params = cell.init(jax.random.PRNGKey(1), x, g)
    want = cell.apply(params, x, g)
    ops = DiffusionOperators.from_graph(g)

    @jax.jit
    def step(p, op, xx):
        return cell.apply(p, xx, op)

    np.testing.assert_allclose(step(params, ops, x), want, atol=1e-4)

    @jax.jit
    def loss_grad(p, op, xx):
        return jax.grad(
            lambda pp: (cell.apply(pp, xx, op) ** 2).sum()
        )(p)

    g_ref = jax.grad(lambda pp: (cell.apply(pp, x, g) ** 2).sum())(params)
    g_got = loss_grad(params, ops, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3), g_got, g_ref
    )


def test_prenormalized_spmm_matches_segment(rng):
    g = make_graph(rng, 100, 700)
    x = jnp.asarray(rng.normal(size=(100, 8)).astype(np.float32))
    op = prenormalize_gcn(g)
    want = spmm_segment(op, x)
    op_b = prenormalize_gcn(g, bcsr=True, min_block_edges=8)
    from pytorch_geometric_temporal_tpu.ops import spmm

    np.testing.assert_allclose(spmm(op_b, x), want, atol=1e-4)
