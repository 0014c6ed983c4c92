"""The automatic large-graph BCSR path (round-2 headline fix).

A plain Graph above the dense threshold must hit the block-sparse kernel
with zero user opt-in when its arrays are concrete at trace time (the
ordinary closed-over-graph pattern), must memoize the build, and must fall
back LOUDLY (one warning) when the graph is traced.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.config import config_override
from pytorch_geometric_temporal_tpu.ops import Graph, spmm, spmm_segment
from pytorch_geometric_temporal_tpu.ops import spmm as spmm_mod
from pytorch_geometric_temporal_tpu.ops.graph import cheb_norm, diffusion_norms, gcn_norm


def _graph(rng, n=300, e=2000):
    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    w = rng.uniform(0.1, 1.0, ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=n)


def test_auto_bcsr_fires_and_matches_segment(rng):
    g = _graph(rng)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
    # force the 'pallas' resolution (CPU tests would otherwise resolve to
    # segment); the kernel itself runs through the XLA fallback on CPU.
    with config_override(spmm_backend="pallas"):
        out = spmm(g, x)
    ref = spmm_segment(g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert getattr(g, "_op_cache", None), "BCSR operator was not cached"


def test_auto_bcsr_inside_jit_closure(rng):
    """Closed-over graph: concrete at trace time -> kernel path, correct."""
    g = _graph(rng)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)).astype(np.float32))

    with config_override(spmm_backend="pallas"):

        @jax.jit
        def f(xx):
            return spmm(g, xx)

        out = f(x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_segment(g, x)), rtol=2e-5, atol=2e-5
    )


def test_norm_memoization_single_build(rng):
    """Six cheb_norm calls on one concrete graph build one operator."""
    g = _graph(rng)
    n1 = cheb_norm(g)
    n2 = cheb_norm(g)
    assert n1 is n2
    d1 = diffusion_norms(g)
    d2 = diffusion_norms(g)
    assert d1[0] is d2[0] and d1[1] is d2[1]
    g1 = gcn_norm(g)
    g2 = gcn_norm(g)
    assert g1 is g2
    # different params -> different cache entries, not collisions
    assert gcn_norm(g, improved=True) is not g1


def test_norms_never_memoize_tracers(rng):
    g = _graph(rng)

    @jax.jit
    def f(gg, x):
        return spmm_segment(gcn_norm(gg), x)

    x = jnp.asarray(rng.normal(size=(g.num_nodes, 4)).astype(np.float32))
    f(g, x)  # graph passes through jit arg -> traced inside
    cache = getattr(g, "_op_cache", {}) or {}
    for v in cache.values():
        leaves = jax.tree_util.tree_leaves(v)
        assert not any(isinstance(l, jax.core.Tracer) for l in leaves)


def test_traced_large_graph_warns_once(rng):
    g = _graph(rng)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 4)).astype(np.float32))
    spmm_mod._warned_traced_fallback = False

    @jax.jit
    def f(gg, xx):
        return spmm(gg, xx)

    with config_override(spmm_backend="pallas"):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = f(g, x)
            f(g, jnp.asarray(rng.normal(size=(g.num_nodes, 4)).astype(np.float32)) * 0 + x)
        msgs = [str(r.message) for r in rec if "traced" in str(r.message)]
    assert len(msgs) == 1, msgs
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_segment(g, x)), rtol=1e-5, atol=1e-5
    )


def test_weight_override_uses_segment(rng):
    """Traced attention-style weight overrides cannot be tiled; result must
    still be correct (segment fallback, no warning, no crash)."""
    g = _graph(rng)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 4)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(0.5, 1.5, g.edge_pad).astype(np.float32))
    with config_override(spmm_backend="pallas"):
        out = spmm(g, x, weights=w2)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(spmm_segment(g, x, weights=w2)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_bf16_activations_get_bf16_tiles(rng):
    g = _graph(rng)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 8))).astype(jnp.bfloat16)
    with config_override(spmm_backend="pallas"):
        out = spmm(g, x)
    keys = list(getattr(g, "_op_cache").keys())
    assert any("bfloat16" in str(k) for k in keys), keys
    ref = spmm_segment(g, x.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_end_to_end_model_hits_kernel(rng):
    """A plain DCRNN cell on a large graph goes through the auto path."""
    from pytorch_geometric_temporal_tpu.models import DCRNN

    g = _graph(rng, n=600, e=4000)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 3)).astype(np.float32))
    model = DCRNN(out_channels=5, K=2)
    with config_override(spmm_backend="pallas"):
        params = model.init(jax.random.PRNGKey(0), x, g)
        h = model.apply(params, x, g)
    assert h.shape == (g.num_nodes, 5)
    # diffusion_norms memoized on g; each normalized operator carries its
    # own BCSR build
    assert ("diffusion_norms",) in getattr(g, "_op_cache")
    p_fwd, p_bwd = getattr(g, "_op_cache")[("diffusion_norms",)]
    assert getattr(p_fwd, "_op_cache", None) and getattr(p_bwd, "_op_cache", None)
    with config_override(spmm_backend="segment"):
        h_ref = model.apply(params, x, g)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=2e-5, atol=2e-5)


def test_model_inside_jit_no_tracer_leak_and_hits_kernel(rng):
    """Regression: a jitted training loop over a closed-over concrete graph
    (bench.py's pattern) must not leak tracers through the norm memo, and
    the normalized operator must stay concrete so the BCSR path fires
    INSIDE the trace."""
    from pytorch_geometric_temporal_tpu.models import DCRNN

    g = _graph(rng, n=400, e=3000)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 3)).astype(np.float32))
    model = DCRNN(out_channels=4, K=2)
    with config_override(spmm_backend="pallas"):
        params = model.init(jax.random.PRNGKey(0), x, g)

        @jax.jit
        def step1(p, xx):
            return model.apply(p, xx, g).sum()

        a = float(step1(params, x))

        @jax.jit  # a SECOND trace must reuse the cache without leaks
        def step2(p, xx):
            return model.apply(p, xx, g).sum() * 2.0

        b = float(step2(params, x))
    assert np.isfinite(a) and np.isfinite(b)
    # the memoized normalized operators must be concrete (not tracers)
    cache = getattr(g, "_op_cache")
    leaves = jax.tree_util.tree_leaves(list(cache.values()))
    assert not any(isinstance(l, jax.core.Tracer) for l in leaves)
    # and the normalized graphs must carry their own BCSR builds (the
    # kernel fired inside the trace)
    p_fwd, p_bwd = cache[("diffusion_norms",)]
    assert getattr(p_fwd, "_op_cache", None), "BCSR did not fire inside jit"


def test_bipartite_graph_skips_tiler(rng):
    ei = np.stack([rng.integers(0, 50, 200), rng.integers(0, 30, 200)])
    g = Graph.from_edge_index(ei, num_nodes=30, num_src=50)
    x = jnp.asarray(rng.normal(size=(50, 4)).astype(np.float32))
    with config_override(spmm_backend="pallas"):
        out = spmm(g, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_segment(g, x)), rtol=1e-5, atol=1e-5
    )


def test_auto_dispatch_reorders_scrambled_graph(rng):
    """The zero-opt-in path runs the reordering pass: a scrambled banded
    graph reaching spmm via backend='pallas' builds a permuted operator
    (spmm_reorder='auto' default) and still matches the segment oracle;
    spmm_reorder='off' preserves caller ordering."""
    n = 3000
    e = 30_000
    s = rng.integers(0, n, e)
    r = np.clip(s + rng.integers(-10, 11, e), 0, n - 1)
    scram = rng.permutation(n)
    ei = np.stack([scram[s], scram[r]])
    g = Graph.from_edge_index(ei, num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    want = spmm_segment(g, x)
    with config_override(spmm_backend="pallas"):
        out = spmm(g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    mat = g._op_cache[("bcsr", "None", "auto")]
    assert mat.perm is not None  # the scrambled band got relabeled

    g2 = Graph.from_edge_index(ei, num_nodes=n)
    with config_override(spmm_backend="pallas", spmm_reorder="off"):
        out2 = spmm(g2, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert g2._op_cache[("bcsr", "None", None)].perm is None
