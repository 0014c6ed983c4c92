"""Golden tests for graph ops vs dense numpy oracles.

The reference test suite only asserts shapes (reference
``test/recurrent_test.py:78-111``); we additionally verify numerics of every
aggregation primitive against explicit dense linear algebra, since all model
correctness reduces to these.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_geometric_temporal_tpu import config_override
from pytorch_geometric_temporal_tpu.ops import (
    Graph,
    cheb_norm,
    diffusion_norms,
    gcn_norm,
    lambda_max,
    laplacian,
    pad_graphs,
    spmm,
    spmm_dense,
    spmm_segment,
)


def random_graph(rng, n=13, e=40, pad=0, weighted=True):
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    # avoid duplicate (s, r) pairs so dense oracle comparison is exact
    pairs = np.unique(np.stack([s, r]), axis=1)
    e = pairs.shape[1]
    w = rng.uniform(0.5, 2.0, size=e) if weighted else np.ones(e)
    g = Graph.from_edge_index(pairs, w, num_nodes=n, pad_to=e + pad)
    a = np.zeros((n, n))
    a[pairs[0], pairs[1]] = w  # A[s, r] = w
    return g, a


def dense_from_graph(g: Graph):
    """Oracle: materialize M[r, s] from the padded edge arrays."""
    n = g.num_nodes
    m = np.zeros((n, n))
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    w = np.asarray(g.masked_weights())
    for i in range(g.edge_pad):
        m[r[i], s[i]] += w[i]
    return m


@pytest.mark.parametrize("pad", [0, 7])
def test_spmm_matches_dense_oracle(rng, pad):
    g, a = random_graph(rng, pad=pad)
    x = rng.normal(size=(13, 5)).astype(np.float32)
    want = a.T @ x  # out[r] = sum_s A[s,r] x[s]
    np.testing.assert_allclose(spmm_segment(g, jnp.asarray(x)), want, atol=1e-5)
    np.testing.assert_allclose(spmm_dense(g, jnp.asarray(x)), want, atol=1e-5)
    with config_override(spmm_backend="auto"):
        np.testing.assert_allclose(spmm(g, jnp.asarray(x)), want, atol=1e-5)


def test_spmm_batched(rng):
    g, a = random_graph(rng)
    x = rng.normal(size=(3, 4, 13, 5)).astype(np.float32)
    want = np.einsum("sr,btsf->btrf", a, x)
    np.testing.assert_allclose(spmm_segment(g, jnp.asarray(x)), want, atol=1e-5)
    np.testing.assert_allclose(spmm_dense(g, jnp.asarray(x)), want, atol=1e-4)


def test_spmm_weight_override(rng):
    g, a = random_graph(rng)
    x = rng.normal(size=(13, 5)).astype(np.float32)
    w2 = np.asarray(g.weights) * 3.0
    want = 3.0 * (a.T @ x)
    np.testing.assert_allclose(
        spmm_segment(g, jnp.asarray(x), weights=jnp.asarray(w2)), want, atol=1e-5
    )
    np.testing.assert_allclose(
        spmm_dense(g, jnp.asarray(x), weights=jnp.asarray(w2)), want, atol=1e-5
    )


def test_degrees_and_reverse(rng):
    g, a = random_graph(rng, pad=5)
    np.testing.assert_allclose(g.out_degree(), a.sum(1), atol=1e-5)
    np.testing.assert_allclose(g.in_degree(), a.sum(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.reverse().to_adj_t()), a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.to_adj()), a, atol=1e-6)


def test_add_self_loops_keeps_prefix_invariant(rng):
    g, a = random_graph(rng, pad=5)
    g2 = g.add_self_loops(fill_value=2.5)
    assert g2.num_edges == g.num_edges + g.num_nodes
    m = dense_from_graph(g2)
    want = a.T + 2.5 * np.eye(g.num_nodes)
    np.testing.assert_allclose(m, want, atol=1e-6)
    # padding stays trailing with zero weight
    assert np.all(np.asarray(g2.weights)[g2.num_edges :] == 0)


@pytest.mark.parametrize("pad", [0, 5])
def test_gcn_norm(rng, pad):
    g, a = random_graph(rng, pad=pad)
    n = g.num_nodes
    at = a.T + np.eye(n)  # M[r,s] with self loops
    deg = at.sum(1)
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    want = dis[:, None] * at * dis[None, :]
    got = dense_from_graph(gcn_norm(g))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("norm", ["sym", "rw", None])
def test_laplacian(rng, norm):
    g, a = random_graph(rng, pad=3)
    n = g.num_nodes
    at = a.T  # M[r, s] = A[s, r]
    deg = a.sum(1)  # source-side (out) degree, PyG get_laplacian convention
    inv = np.where(deg > 0, 1.0 / np.where(deg > 0, deg, 1), 0.0)
    dis = np.sqrt(inv)
    if norm == "sym":
        # entry (r,s): dis[s] * w(s->r) * dis[r]
        want = np.eye(n) - (dis[:, None] * at * dis[None, :])
    elif norm == "rw":
        # entry (r,s): w(s->r) / deg_out(s)
        want = np.eye(n) - at * inv[None, :]
    else:
        want = np.diag(deg) - at
    got = dense_from_graph(laplacian(g, norm))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cheb_norm_sym_lambda2(rng):
    # With lambda_max=2 and sym norm, L_hat = -D^-1/2 A D^-1/2 exactly
    # (self-loops dropped first, per PyG ChebConv.__norm__)
    g, a = random_graph(rng, pad=3)
    a = a - np.diag(np.diag(a))
    at = a.T
    deg = a.sum(1)
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    want = -(dis[:, None] * at * dis[None, :])
    got = dense_from_graph(cheb_norm(g, "sym", 2.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lambda_max_power_iteration(rng):
    # symmetric (undirected) graph: the realistic case for lambda_max
    n = 13
    s = rng.integers(0, n, size=30)
    r = rng.integers(0, n, size=30)
    keep = s != r
    s, r = s[keep], r[keep]
    ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
    ei = np.unique(ei, axis=1)
    g = Graph.from_edge_index(ei, np.ones(ei.shape[1]), num_nodes=n)
    lap = dense_from_graph(laplacian(g, "sym"))
    want = np.max(np.linalg.eigvalsh((lap + lap.T) / 2))
    got = float(lambda_max(g, "sym", iters=300))
    np.testing.assert_allclose(got, want, rtol=5e-2)


def test_diffusion_norms(rng):
    g, a = random_graph(rng, pad=4)
    n = g.num_nodes
    deg_out = a.sum(1)  # A[s, r]: out-degree of s sums over r
    deg_in = a.sum(0)
    inv = lambda d: np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    p_fwd = inv(deg_out)[:, None] * a  # P_fwd[i, j] = A[i, j]/deg_out(i)
    p_bwd = inv(deg_in)[:, None] * a.T
    gf, gb = diffusion_norms(g)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    np.testing.assert_allclose(spmm_segment(gf, jnp.asarray(x)), p_fwd @ x, atol=1e-5)
    np.testing.assert_allclose(spmm_segment(gb, jnp.asarray(x)), p_bwd @ x, atol=1e-5)


def test_pad_and_stack(rng):
    g1, _ = random_graph(rng, e=20)
    g2, _ = random_graph(rng, e=35)
    p1, p2 = pad_graphs([g1, g2])
    assert p1.edge_pad == p2.edge_pad
    x = rng.normal(size=(13, 4)).astype(np.float32)
    np.testing.assert_allclose(
        spmm_segment(p1, jnp.asarray(x)), spmm_segment(g1, jnp.asarray(x)), atol=1e-6
    )


def test_graph_is_pytree(rng):
    g, _ = random_graph(rng)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    assert len(leaves) == 3
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2.num_nodes == g.num_nodes

    @jax.jit
    def f(graph, x):
        return spmm(graph, x)

    x = jnp.ones((13, 2))
    f(g, x)  # must not raise


def test_sddmm(rng):
    from pytorch_geometric_temporal_tpu.ops import sddmm

    g, a = random_graph(rng, pad=4)
    qa = rng.normal(size=(13, 6)).astype(np.float32)
    qb = rng.normal(size=(13, 6)).astype(np.float32)
    scores = np.asarray(sddmm(g, jnp.asarray(qa), jnp.asarray(qb)))
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    for i in range(g.num_edges):
        np.testing.assert_allclose(
            scores[i], qa[s[i]] @ qb[r[i]], atol=1e-4
        )
    assert np.all(scores[g.num_edges:] == 0)
