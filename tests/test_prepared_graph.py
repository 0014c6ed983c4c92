"""PreparedGraph: prebuilt operators crossing jit boundaries as arguments.

The production large-graph form: host-build the normalized operators once,
pass the bundle as a jit ARGUMENT (pytree leaves = runtime buffers, not HLO
constants), and have every norm function transparently return the prebuilt
operator.  Must be numerically identical to the raw-Graph path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_temporal_tpu.config import config_override
from pytorch_geometric_temporal_tpu.ops import (
    Graph,
    prepare_graph,
    spmm_segment,
)
from pytorch_geometric_temporal_tpu.ops.graph import (
    cheb_norm,
    diffusion_norms,
    gcn_norm,
)


def _graph(rng, n=80, e=500):
    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    w = rng.uniform(0.1, 1.0, ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=n)


def test_norm_functions_return_prebuilt_ops(rng):
    g = _graph(rng)
    pg = prepare_graph(g)
    assert gcn_norm(pg) is pg.ops[("gcn_norm", False, True)]
    assert cheb_norm(pg) is pg.ops[("cheb_norm", "sym", 2.0)]
    assert diffusion_norms(pg) is pg.ops[("diffusion_norms",)]
    # mismatched params fall through to recomputation from the raw graph
    out = gcn_norm(pg, improved=True)
    assert out is not pg.ops[("gcn_norm", False, True)]


def test_prepared_matches_raw_numerics(rng):
    g = _graph(rng)
    pg = prepare_graph(g, bcsr=False)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 6)).astype(np.float32))
    for fn in (gcn_norm, cheb_norm):
        a = spmm_segment(fn(g), x)
        b = spmm_segment(fn(pg), x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    fa, ba = diffusion_norms(g)
    fb, bb = diffusion_norms(pg)
    np.testing.assert_allclose(np.asarray(spmm_segment(fa, x)),
                               np.asarray(spmm_segment(fb, x)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(spmm_segment(ba, x)),
                               np.asarray(spmm_segment(bb, x)),
                               rtol=1e-5, atol=1e-5)


def test_prepared_as_jit_argument_no_constants(rng):
    """PreparedGraph flows through jit as a pytree argument; the lowered
    module must not embed the operator values as large literals."""
    g = _graph(rng, n=300, e=3000)
    with config_override(dense_threshold=100):  # force BCSR form
        pg = prepare_graph(g, kinds=("diffusion",))
    from pytorch_geometric_temporal_tpu.models import DCRNNSeq

    x = jnp.asarray(rng.normal(size=(2, 3, g.num_nodes, 4)).astype(np.float32))
    model = DCRNNSeq(out_channels=4, K=2)
    params = model.init(jax.random.PRNGKey(0), x, pg)

    @jax.jit
    def fwd(p, xx, graph):
        return model.apply(p, xx, graph)

    out = fwd(params, x, pg)
    assert out.shape == (2, 3, g.num_nodes, 4)
    # reference: raw graph, segment path
    with config_override(spmm_backend="segment"):
        ref = model.apply(params, x, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    txt = fwd.lower(params, x, pg).as_text()
    # the BCSR tile payload (~3000 edges -> >1e4 floats) must not be inline
    assert len(txt) < 2_000_000


def test_prepared_with_models_gcn_and_cheb(rng):
    """GCNConv- and ChebConv-backed cells accept a PreparedGraph."""
    from pytorch_geometric_temporal_tpu.models import GConvGRU, TGCN

    g = _graph(rng)
    pg = prepare_graph(g, bcsr=False)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 5)).astype(np.float32))

    gru = GConvGRU(out_channels=7, K=2)
    p = gru.init(jax.random.PRNGKey(0), x, g)
    a = gru.apply(p, x, g)
    b = gru.apply(p, x, pg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    tg = TGCN(out_channels=7)
    p = tg.init(jax.random.PRNGKey(0), x, g)
    a = tg.apply(p, x, g)
    b = tg.apply(p, x, pg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_prepared_graph_delegates_graph_protocol(rng):
    g = _graph(rng)
    pg = prepare_graph(g, kinds=("gcn",))
    assert pg.num_nodes == g.num_nodes
    assert pg.num_edges == g.num_edges
    assert pg.edge_pad == g.edge_pad
    np.testing.assert_array_equal(np.asarray(pg.senders),
                                  np.asarray(g.senders))
