"""Node-partitioned DCRNN: model-level halo-exchange training (north star).

Oracle: the single-device DCRNN with the SAME parameter tree.  Forward,
gradient and a full jitted training step must match across an 8-virtual-
device mesh, with features node-sharded throughout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_geometric_temporal_tpu.config import config_override
from pytorch_geometric_temporal_tpu.models import DCRNN, DCRNNSeq
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.parallel import (
    DCRNNPartitioned,
    DCRNNPartitionedSeq,
    PartitionedDiffusionOperators,
    make_mesh,
    spmm_partitioned,
)

P = 8


def make_graph(rng, n=37, e=180):
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n])
    ei = np.unique(
        np.concatenate([ring, ring[::-1], rng.integers(0, n, (2, e))], axis=1),
        axis=1,
    )
    w = rng.uniform(0.5, 2.0, ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=n)


@pytest.fixture
def setup(rng):
    g = make_graph(rng)
    pops = PartitionedDiffusionOperators.from_graph(g, P)
    mesh = make_mesh({"graph": P})
    return g, pops, mesh


def test_trailing_dims_flatten(rng, setup):
    g, pops, mesh = setup
    n_pad = pops.padded_nodes
    x = rng.normal(size=(g.num_nodes, 3, 4)).astype(np.float32)
    xs = pops.shard_features(jnp.asarray(x), mesh)
    out = spmm_partitioned(pops.p_fwd, xs, mesh, exchange="halo")
    assert out.shape == (n_pad, 3, 4)
    # oracle: flatten trailing dims by hand
    x2 = pops.pad_features(jnp.asarray(x)).reshape(n_pad, -1)
    xs2 = pops.p_fwd.shard_features(jnp.zeros((n_pad, 12), jnp.float32) + x2,
                                    mesh)
    out2 = spmm_partitioned(pops.p_fwd, xs2, mesh, exchange="halo")
    np.testing.assert_allclose(np.asarray(out).reshape(n_pad, -1),
                               np.asarray(out2), atol=1e-5)


def test_cell_matches_single_device(rng, setup):
    g, pops, mesh = setup
    n, B, F, C, K = g.num_nodes, 3, 2, 5, 3
    x = rng.normal(size=(B, n, F)).astype(np.float32)
    h = rng.normal(size=(B, n, C)).astype(np.float32)

    single = DCRNN(out_channels=C, K=K)
    with config_override(spmm_backend="segment"):
        params = single.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        want = np.asarray(
            single.apply(params, jnp.asarray(x), g, jnp.asarray(h))
        )

    part = DCRNNPartitioned(out_channels=C, K=K)
    # node-leading layout, padded + sharded
    xp = pops.shard_features(jnp.asarray(x).transpose(1, 0, 2), mesh)
    hp = pops.shard_features(jnp.asarray(h).transpose(1, 0, 2), mesh)
    got = part.apply(params, xp, pops, mesh, hp)  # SAME param tree
    got = np.asarray(got)[:n].transpose(1, 0, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_seq_and_train_step_match_single_device(rng, setup):
    g, pops, mesh = setup
    n, B, T, F, C, K = g.num_nodes, 2, 4, 2, 4, 2
    x = rng.normal(size=(B, T, n, F)).astype(np.float32)
    y = rng.normal(size=(B, T, n, C)).astype(np.float32)

    single = DCRNNSeq(out_channels=C, K=K)
    with config_override(spmm_backend="segment"):
        params = single.init(jax.random.PRNGKey(0), jnp.asarray(x), g)

        def loss_single(p):
            return jnp.mean((single.apply(p, jnp.asarray(x), g)
                             - jnp.asarray(y)) ** 2)

        want_loss, want_grads = jax.value_and_grad(loss_single)(params)

    part = DCRNNPartitionedSeq(out_channels=C, K=K)
    # (B, T, N, F) -> (T, N_pad, B, F), node-sharded
    xt = jnp.asarray(x).transpose(1, 2, 0, 3)
    n_pad = pops.padded_nodes
    xt = jnp.pad(xt, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    yt = jnp.asarray(y).transpose(1, 2, 0, 3)

    mask = (jnp.arange(n_pad) < n).astype(jnp.float32)[None, :, None, None]

    @jax.jit
    def loss_part(p, xb):
        hs = part.apply(p, xb, pops, mesh)  # (T, N_pad, B, C)
        diff = (hs[:, :n].transpose(0, 2, 1, 3)
                - yt.transpose(0, 2, 1, 3)) ** 2
        return jnp.mean(diff)

    got_loss, got_grads = jax.value_and_grad(loss_part)(params, xt)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-4)
    # identical param trees (names shared with the single-device model)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4
        ),
        want_grads,
        got_grads,
    )

    # one full jitted optimizer step runs under the mesh
    opt = optax.adam(1e-3)
    st = opt.init(params)

    @jax.jit
    def train_step(p, st, xb):
        loss, grads = jax.value_and_grad(loss_part)(p, xb)
        ups, st = opt.update(grads, st)
        return optax.apply_updates(p, ups), st, loss

    p2, st, loss = train_step(params, st, xt)
    assert np.isfinite(float(loss))
    assert mask.shape[1] == n_pad  # layout sanity
