"""Multi-device tests on the 8-device virtual CPU mesh.

Covers what the reference never tests (its Dask-DDP path has no tests at
all, SURVEY §4): data-parallel training equivalence and node-partitioned
aggregation equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_geometric_temporal_tpu.models import DCRNNSeq
from pytorch_geometric_temporal_tpu.ops import Graph, spmm_segment
from pytorch_geometric_temporal_tpu.parallel import (
    PartitionedGraph,
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
    spmm_partitioned,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

key = jax.random.PRNGKey(0)


def make_graph(rng, n, e):
    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    w = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=n)


def test_make_mesh_shapes():
    mesh = make_mesh({"dp": 4, "graph": 2})
    assert mesh.shape == {"dp": 4, "graph": 2}
    mesh = make_mesh({"dp": -1})
    assert mesh.shape["dp"] == 8


@pytest.mark.parametrize("num_parts", [2, 8])
def test_partitioned_spmm_matches_dense(rng, num_parts):
    n = 37  # deliberately not divisible by num_parts
    g = make_graph(rng, n, 150)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    want = spmm_segment(g, x)

    mesh = make_mesh({"graph": num_parts})
    pg = PartitionedGraph.from_graph(g, num_parts)
    xs = pg.shard_features(x, mesh)
    out = spmm_partitioned(pg, xs, mesh)
    np.testing.assert_allclose(np.asarray(out)[:n], want, atol=1e-5)
    # padding rows stay zero
    assert np.all(np.asarray(out)[n:] == 0)


def test_partitioned_spmm_grad(rng):
    n = 16
    g = make_graph(rng, n, 60)
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    mesh = make_mesh({"graph": 4})
    pg = PartitionedGraph.from_graph(g, 4)

    def f_sharded(xp):
        return (spmm_partitioned(pg, xp, mesh) ** 2).sum()

    def f_ref(x_):
        return (spmm_segment(g, x_) ** 2).sum()

    gs = jax.grad(f_sharded)(pg.pad_features(x))
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gs)[:n], gr, atol=1e-4)


def test_dp_train_step_matches_single_device(rng):
    B, T, N, F, C = 8, 4, 12, 3, 8
    g = make_graph(rng, N, 40)
    x = jnp.asarray(rng.normal(size=(B, T, N, F)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, T, N, C)).astype(np.float32))
    model = DCRNNSeq(out_channels=C, K=2)
    params = model.init(key, x, g)
    opt = optax.sgd(0.1)

    def loss_fn(p, xb, yb):
        return jnp.mean((model.apply(p, xb, g) - yb) ** 2)

    # single-device reference update
    l_ref, grads = jax.value_and_grad(loss_fn)(params, x, y)
    upd, _ = opt.update(grads, opt.init(params))
    p_ref = optax.apply_updates(params, upd)

    mesh = make_mesh({"dp": 8})
    step = make_dp_train_step(loss_fn, opt, mesh, donate=False)
    p_repl = replicate(params, mesh)
    o_repl = replicate(opt.init(params), mesh)
    xb = shard_batch(x, mesh)
    yb = shard_batch(y, mesh)
    p_new, o_new, loss = step(p_repl, o_repl, xb, yb)
    np.testing.assert_allclose(float(loss), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_new),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_spmd_dcrnn_2d_mesh(rng):
    """DCRNNSeq under jit with a 2D (dp × graph) sharding: batch sharded on
    'dp', node axis sharded on 'graph'; XLA inserts the collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, T, N, F, C = 4, 3, 16, 3, 8
    g = make_graph(rng, N, 50)
    x = jnp.asarray(rng.normal(size=(B, T, N, F)).astype(np.float32))
    model = DCRNNSeq(out_channels=C, K=2)
    params = model.init(key, x, g)
    want = model.apply(params, x, g)

    mesh = make_mesh({"dp": 2, "graph": 4})
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, "graph", None)))
    ps = replicate(params, mesh)
    gs = replicate(g, mesh)

    @jax.jit
    def fwd(p, xb, gb):
        return model.apply(p, xb, gb)

    out = fwd(ps, xs, gs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("num_parts", [2, 4, 8])
def test_partitioned_spmm_scatter_exchange(rng, num_parts):
    """sender-partitioned psum_scatter variant == segment-sum oracle."""
    n = 29
    g = make_graph(rng, n, 120)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    want = spmm_segment(g, x)
    mesh = make_mesh({"graph": num_parts})
    pg = PartitionedGraph.from_graph(g, num_parts, by="sender")
    xs = pg.shard_features(x, mesh)
    out = spmm_partitioned(pg, xs, mesh, exchange="scatter")
    np.testing.assert_allclose(np.asarray(out)[:n], want, atol=1e-5)


def test_partitioned_spmm_scatter_grad(rng):
    n = 16
    g = make_graph(rng, n, 60)
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    mesh = make_mesh({"graph": 4})
    pg = PartitionedGraph.from_graph(g, 4, by="sender")

    def f_sharded(xp):
        return (spmm_partitioned(pg, xp, mesh, exchange="scatter") ** 2).sum()

    def f_ref(x_):
        return (spmm_segment(g, x_) ** 2).sum()

    gs = jax.grad(f_sharded)(pg.pad_features(x))
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gs)[:n], gr, atol=1e-4)


@pytest.mark.parametrize("num_parts", [2, 4, 8])
def test_partitioned_spmm_halo_exchange(rng, num_parts):
    """all_to_all boundary-row halo variant == segment-sum oracle."""
    n = 43  # not divisible by num_parts
    g = make_graph(rng, n, 170)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    want = spmm_segment(g, x)
    mesh = make_mesh({"graph": num_parts})
    pg = PartitionedGraph.from_graph(g, num_parts, by="halo")
    assert pg.halo_size <= pg.nodes_per_part  # halo never exceeds a block
    xs = pg.shard_features(x, mesh)
    out = spmm_partitioned(pg, xs, mesh, exchange="halo")
    np.testing.assert_allclose(np.asarray(out)[:n], want, atol=1e-5)
    assert np.all(np.asarray(out)[n:] == 0)


def test_partitioned_spmm_halo_grad(rng):
    n = 16
    g = make_graph(rng, n, 60)
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    mesh = make_mesh({"graph": 4})
    pg = PartitionedGraph.from_graph(g, 4, by="halo")

    def f_sharded(xp):
        return (spmm_partitioned(pg, xp, mesh, exchange="halo") ** 2).sum()

    def f_ref(x_):
        return (spmm_segment(g, x_) ** 2).sum()

    gs = jax.grad(f_sharded)(pg.pad_features(x))
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gs)[:n], gr, atol=1e-4)


def test_halo_locality_shrinks_exchange(rng):
    """On a block-local graph (edges only within node blocks ± boundary),
    the halo buffer is far smaller than the full feature matrix."""
    n, parts = 64, 8
    blk = n // parts
    # ring-of-blocks: each node connects within its block plus one
    # boundary edge into the next block
    src, dst = [], []
    for b in range(parts):
        lo = b * blk
        for i in range(blk):
            src.append(lo + i)
            dst.append(lo + (i + 1) % blk)
        src.append(lo + blk - 1)
        dst.append((lo + blk) % n)
    ei = np.stack([np.array(src), np.array(dst)])
    g = Graph.from_edge_index(ei, np.ones(ei.shape[1], np.float32), num_nodes=n)
    pg = PartitionedGraph.from_graph(g, parts, by="halo")
    # each part only needs 1 remote row (from the previous block)
    assert pg.halo_size <= blk  # much less than all_gather's full N rows
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    mesh = make_mesh({"graph": parts})
    out = spmm_partitioned(pg, pg.shard_features(x, mesh), mesh,
                           exchange="halo")
    np.testing.assert_allclose(np.asarray(out)[:n], spmm_segment(g, x),
                               atol=1e-5)


def test_halo_interior_boundary_split(rng):
    """Interior edges (locally-owned senders) bypass the halo entirely —
    on the ring-of-blocks graph each part has exactly one boundary edge,
    everything else interior, and halo_size == 1."""
    n, parts = 64, 8
    blk = n // parts
    src, dst = [], []
    for b in range(parts):
        lo = b * blk
        for i in range(blk):
            src.append(lo + i)
            dst.append(lo + (i + 1) % blk)
        src.append(lo + blk - 1)
        dst.append((lo + blk) % n)
    ei = np.stack([np.array(src), np.array(dst)])
    g = Graph.from_edge_index(ei, np.ones(ei.shape[1], np.float32),
                              num_nodes=n)
    pg = PartitionedGraph.from_graph(g, parts, by="halo")
    assert pg.halo_size == 1           # one remote row per part
    assert pg.edges_per_part == 1      # boundary edges
    assert pg.interior_edges_per_part == blk
    # interior senders never reference the halo buffer
    assert int(np.asarray(pg.int_senders).max()) < pg.nodes_per_part
    # and the split is loss-free: same oracle result
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    mesh = make_mesh({"graph": parts})
    out = spmm_partitioned(pg, pg.shard_features(x, mesh), mesh,
                           exchange="halo")
    np.testing.assert_allclose(np.asarray(out)[:n], spmm_segment(g, x),
                               atol=1e-5)


def test_partitioned_exchange_validation(rng):
    g = make_graph(rng, 16, 40)
    mesh = make_mesh({"graph": 4})
    pg_r = PartitionedGraph.from_graph(g, 4, by="receiver")
    pg_s = PartitionedGraph.from_graph(g, 4, by="sender")
    x = pg_r.shard_features(jnp.ones((16, 3)), mesh)
    with pytest.raises(ValueError):
        spmm_partitioned(pg_r, x, mesh, exchange="scatter")
    with pytest.raises(ValueError):
        spmm_partitioned(pg_s, x, mesh, exchange="gather")
    with pytest.raises(ValueError):
        spmm_partitioned(pg_r, x, mesh, exchange="halo")
    with pytest.raises(ValueError):
        spmm_partitioned(pg_r, x, mesh, exchange="bogus")
    with pytest.raises(ValueError):
        PartitionedGraph.from_graph(g, 4, by="bogus")


def test_ici_bytes_per_step_model():
    """Analytic ICI volume: matches the built partitions' actual shapes.

    Basis for the scaling table in docs/performance.md (VERDICT r3 #8):
    gather/scatter move one (npp, F) shard per ring hop; halo moves only
    the (halo_size, F) boundary block per peer.
    """
    import numpy as np

    from pytorch_geometric_temporal_tpu.ops import Graph
    from pytorch_geometric_temporal_tpu.parallel import PartitionedGraph

    rng = np.random.default_rng(0)
    n, e, f, p = 1024, 8000, 16, 4
    s = rng.integers(0, n, size=e)
    r = np.clip(s + rng.integers(-30, 31, size=e), 0, n - 1)
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    g = Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n)

    pg_r = PartitionedGraph.from_graph(g, p, by="receiver")
    assert pg_r.ici_bytes_per_step(f) == (p - 1) * pg_r.nodes_per_part * f * 4

    pg_h = PartitionedGraph.from_graph(g, p, by="halo")
    assert pg_h.halo_size > 0
    assert pg_h.ici_bytes_per_step(f) == (p - 1) * pg_h.halo_size * f * 4
    # banded cut: the halo is a small fraction of the node shard
    assert pg_h.halo_size < pg_r.nodes_per_part / 2
    assert pg_h.ici_bytes_per_step(f) < pg_r.ici_bytes_per_step(f)


def test_multihost_initialize_single_host():
    """Single-host path: no distributed init, correct rank/world fields."""
    from pytorch_geometric_temporal_tpu.parallel import multihost

    info = multihost.initialize()
    assert info["rank"] == 0
    assert info["world_size"] == 1
    assert info["local_devices"] == info["global_devices"] >= 1
