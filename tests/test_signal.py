"""Signal-layer tests: iterator semantics, slicing, dtype rules, hetero
None-handling, stacking, index batching.

Mirrors reference ``test/dataset_test.py`` synthetic-generator strategy
(``:38-72``) and ``test/batch_test.py``; adds stacked-scan equivalence and
device-windower equivalence checks (reference ``test/index_test.py:18-40``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.signal import (
    DeviceWindower,
    DynamicGraphStaticSignal,
    DynamicGraphTemporalSignal,
    DynamicGraphTemporalSignalBatch,
    DynamicHeteroGraphTemporalSignal,
    IndexDataset,
    StackedSignal,
    StaticGraphTemporalSignal,
    StaticGraphTemporalSignalBatch,
    StaticHeteroGraphTemporalSignal,
    iter_index_batches,
    temporal_signal_split,
)

N, F, T = 10, 4, 12


def generate_signal(rng, snapshot_count=T, n=N, f=F):
    edge_index = np.unique(rng.integers(0, n, size=(2, 30)), axis=1)
    edge_weight = rng.uniform(size=edge_index.shape[1]).astype(np.float32)
    features = [rng.uniform(size=(n, f)).astype(np.float32) for _ in range(snapshot_count)]
    targets = [rng.uniform(size=(n,)).astype(np.float32) for _ in range(snapshot_count)]
    return edge_index, edge_weight, features, targets


def test_static_graph_temporal_signal(rng):
    ei, ew, feats, targs = generate_signal(rng)
    extra = [rng.uniform(size=(N, 2)).astype(np.float32) for _ in range(T)]
    sig = StaticGraphTemporalSignal(ei, ew, feats, targs, optional=extra)
    assert sig.snapshot_count == T and len(sig) == T
    count = 0
    for t, snap in enumerate(sig):
        assert snap.x.shape == (N, F)
        assert snap.y.shape == (N,)
        assert snap.y.dtype == jnp.float32
        assert snap.optional.shape == (N, 2)
        assert snap.edge_index.shape[0] == 2
        np.testing.assert_allclose(snap.x, feats[t])
        count += 1
    assert count == T
    # iterator resets
    assert sum(1 for _ in sig) == T


def test_int_targets_become_int32(rng):
    ei, ew, feats, _ = generate_signal(rng)
    targs = [rng.integers(0, 5, size=(N,)) for _ in range(T)]
    sig = StaticGraphTemporalSignal(ei, ew, feats, targs)
    snap = sig[0]
    assert snap.y.dtype == jnp.int32


def test_none_features_pass_through(rng):
    ei, ew, _, targs = generate_signal(rng)
    sig = StaticGraphTemporalSignal(ei, ew, [None] * T, targs)
    assert sig[0].x is None


def test_slicing_and_split(rng):
    ei, ew, feats, targs = generate_signal(rng)
    sig = StaticGraphTemporalSignal(ei, ew, feats, targs)
    train, test = temporal_signal_split(sig, 0.75)
    assert train.snapshot_count == 9 and test.snapshot_count == 3
    np.testing.assert_allclose(test[0].x, feats[9])
    sub = sig[2:5]
    assert sub.snapshot_count == 3
    np.testing.assert_allclose(sub[0].x, feats[2])


def test_temporal_consistency_assert(rng):
    ei, ew, feats, targs = generate_signal(rng)
    with pytest.raises(AssertionError):
        StaticGraphTemporalSignal(ei, ew, feats[:-1], targs)
    with pytest.raises(AssertionError):
        StaticGraphTemporalSignal(ei, ew, feats, targs, bad=[1, 2])


def test_dynamic_graph_temporal_signal(rng):
    eis = [np.unique(rng.integers(0, N, size=(2, rng.integers(10, 30))), axis=1)
           for _ in range(T)]
    ews = [rng.uniform(size=e.shape[1]).astype(np.float32) for e in eis]
    feats = [rng.uniform(size=(N, F)).astype(np.float32) for _ in range(T)]
    targs = [rng.uniform(size=(N,)).astype(np.float32) for _ in range(T)]
    sig = DynamicGraphTemporalSignal(eis, ews, feats, targs)
    pads = {snap.graph.edge_pad for snap in sig}
    assert len(pads) == 1  # all snapshots padded to a common edge count
    for t, snap in enumerate(sig):
        assert snap.graph.num_edges == eis[t].shape[1]


def test_dynamic_graph_static_signal(rng):
    eis = [np.unique(rng.integers(0, N, size=(2, 20)), axis=1) for _ in range(T)]
    ews = [rng.uniform(size=e.shape[1]).astype(np.float32) for e in eis]
    feat = rng.uniform(size=(N, F)).astype(np.float32)
    targs = [rng.uniform(size=(N,)).astype(np.float32) for _ in range(T)]
    sig = DynamicGraphStaticSignal(eis, ews, feat, targs)
    for snap in sig:
        np.testing.assert_allclose(snap.x, feat)
    sub = sig[0:6]
    assert sub.snapshot_count == 6


def test_batch_signals(rng):
    ei, ew, feats, targs = generate_signal(rng)
    batch = rng.integers(0, 2, size=(N,))
    sig = StaticGraphTemporalSignalBatch(ei, ew, feats, targs, batch)
    snap = sig[0]
    assert snap.batch.shape == (N,) and snap.batch.dtype == jnp.int32
    # dynamic variant with per-t batch
    eis = [ei for _ in range(T)]
    ews = [ew for _ in range(T)]
    batches = [rng.integers(0, 2, size=(N,)) for _ in range(T)]
    sig2 = DynamicGraphTemporalSignalBatch(eis, ews, feats, targs, batches)
    for t, snap in enumerate(sig2):
        np.testing.assert_array_equal(snap.batch, batches[t])


def test_hetero_signal(rng):
    n_a, n_b = 6, 4
    ei = {("a", "to", "b"): np.stack([rng.integers(0, n_a, 9),
                                      rng.integers(0, n_b, 9)])}
    ew = {("a", "to", "b"): rng.uniform(size=9).astype(np.float32)}
    feats = [{"a": rng.uniform(size=(n_a, F)).astype(np.float32),
              "b": rng.uniform(size=(n_b, F)).astype(np.float32)}
             for _ in range(T)]
    targs = [{"a": rng.uniform(size=(n_a,)).astype(np.float32),
              "b": None}
             for _ in range(T)]
    sig = StaticHeteroGraphTemporalSignal(ei, ew, feats, targs)
    snap = sig[0]
    assert set(snap.x_dict) == {"a", "b"}
    assert set(snap.y_dict) == {"a"}  # None values skipped
    g = snap.edge_graphs[("a", "to", "b")]
    assert g.num_nodes == n_b and g.src_count == n_a
    train, test = temporal_signal_split(sig, 0.5)
    assert train.snapshot_count == 6


def test_dynamic_hetero_signal(rng):
    n_a = 6
    eis = [{("a", "to", "a"): np.stack([rng.integers(0, n_a, 5),
                                        rng.integers(0, n_a, 5)])}
           for _ in range(T)]
    ews = [{("a", "to", "a"): rng.uniform(size=5).astype(np.float32)}
           for _ in range(T)]
    feats = [{"a": rng.uniform(size=(n_a, F)).astype(np.float32)} for _ in range(T)]
    targs = [{"a": rng.uniform(size=(n_a,)).astype(np.float32)} for _ in range(T)]
    sig = DynamicHeteroGraphTemporalSignal(eis, ews, feats, targs)
    assert sig.snapshot_count == T
    snap = sig[3]
    assert snap.x_dict["a"].shape == (n_a, F)


def test_stacked_signal_matches_iteration(rng):
    ei, ew, feats, targs = generate_signal(rng)
    sig = StaticGraphTemporalSignal(ei, ew, feats, targs)
    st = StackedSignal.from_signal(sig)
    assert st.features.shape == (T, N, F)
    assert st.snapshot_count == T

    def step(carry, x, y, g):
        return carry + x.sum() + y.sum(), x.mean()

    total, means = st.scan(step, jnp.float32(0.0))
    want = sum(float(np.sum(f)) + float(np.sum(y)) for f, y in zip(feats, targs))
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    assert means.shape == (T,)


def test_stacked_dynamic_graph(rng):
    eis = [np.unique(rng.integers(0, N, size=(2, rng.integers(8, 25))), axis=1)
           for _ in range(T)]
    ews = [rng.uniform(size=e.shape[1]).astype(np.float32) for e in eis]
    feats = [rng.uniform(size=(N, F)).astype(np.float32) for _ in range(T)]
    targs = [rng.uniform(size=(N,)).astype(np.float32) for _ in range(T)]
    sig = DynamicGraphTemporalSignal(eis, ews, feats, targs)
    st = StackedSignal.from_signal(sig)
    assert st.graph_dynamic and st.senders.ndim == 2

    from pytorch_geometric_temporal_tpu.ops import spmm_segment

    def step(carry, x, y, g):
        return carry, spmm_segment(g, x)

    _, outs = st.scan(step, 0)
    # per-step equivalence with the iterator path
    for t, snap in enumerate(sig):
        np.testing.assert_allclose(
            outs[t], spmm_segment(snap.graph, snap.x), atol=1e-5
        )


def test_index_dataset_equivalence(rng):
    """Golden cross-check in the spirit of reference test/index_test.py:18-40:
    host IndexDataset slices == device-gathered windows."""
    data = rng.uniform(size=(50, N, F)).astype(np.float32)
    h = 6
    idx = np.arange(50 - 2 * h + 1)
    ds = IndexDataset(idx, data, h)
    dw = DeviceWindower(data, h)
    xb, yb = dw(jnp.asarray(idx[:5]))
    for i in range(5):
        x_host, y_host = ds[i]
        np.testing.assert_allclose(xb[i], x_host, atol=1e-6)
        np.testing.assert_allclose(yb[i], y_host, atol=1e-6)


def test_iter_index_batches_sharding():
    idx = np.arange(100)
    b0 = np.concatenate(list(iter_index_batches(idx, 8, shuffle=False,
                                                world_size=2, rank=0)))
    b1 = np.concatenate(list(iter_index_batches(idx, 8, shuffle=False,
                                                world_size=2, rank=1)))
    assert len(np.intersect1d(b0, b1)) == 0
    assert len(b0) == 48 and len(b1) == 48  # drop_last


def test_stacked_hetero_signal(rng):
    from pytorch_geometric_temporal_tpu.signal import StackedHeteroSignal

    n_a, n_b = 6, 4
    ei = {("a", "to", "b"): np.stack([rng.integers(0, n_a, 9),
                                      rng.integers(0, n_b, 9)])}
    ew = {("a", "to", "b"): rng.uniform(size=9).astype(np.float32)}
    feats = [{"a": rng.uniform(size=(n_a, F)).astype(np.float32),
              "b": rng.uniform(size=(n_b, F)).astype(np.float32)}
             for _ in range(T)]
    targs = [{"a": rng.uniform(size=(n_a,)).astype(np.float32),
              "b": rng.uniform(size=(n_b,)).astype(np.float32)}
             for _ in range(T)]
    sig = StaticHeteroGraphTemporalSignal(ei, ew, feats, targs)
    st = StackedHeteroSignal.from_signal(sig)
    assert st.snapshot_count == T
    assert st.x_dicts["a"].shape == (T, n_a, F)

    from pytorch_geometric_temporal_tpu.ops import spmm_segment

    def step(carry, xd, yd, graphs):
        g = graphs[("a", "to", "b")]
        agg = spmm_segment(g, xd["a"])
        return carry + yd["b"].sum(), agg

    total, aggs = st.scan(step, jnp.float32(0.0))
    assert aggs.shape == (T, n_b, F)
    want = sum(float(t["b"].sum()) for t in targs)
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    # per-step equivalence vs iterator path
    for t, snap in enumerate(sig):
        np.testing.assert_allclose(
            aggs[t],
            spmm_segment(snap.edge_graphs[("a", "to", "b")], snap.x_dict["a"]),
            atol=1e-5,
        )


def test_dynamic_graph_static_signal_batch(rng):
    from pytorch_geometric_temporal_tpu.signal import DynamicGraphStaticSignalBatch

    eis = [np.unique(rng.integers(0, N, size=(2, 15)), axis=1) for _ in range(T)]
    ews = [rng.uniform(size=e.shape[1]).astype(np.float32) for e in eis]
    feat = rng.uniform(size=(N, F)).astype(np.float32)
    targs = [rng.uniform(size=(N,)).astype(np.float32) for _ in range(T)]
    batches = [rng.integers(0, 3, size=(N,)) for _ in range(T)]
    sig = DynamicGraphStaticSignalBatch(eis, ews, feat, targs, batches)
    for t, snap in enumerate(sig):
        np.testing.assert_array_equal(snap.batch, batches[t])
        np.testing.assert_allclose(snap.x, feat)
    sub = sig[3:7]
    assert sub.snapshot_count == 4
    np.testing.assert_array_equal(sub[0].batch, batches[3])


def test_hetero_batch_signals(rng):
    from pytorch_geometric_temporal_tpu.signal import (
        DynamicHeteroGraphStaticSignalBatch,
        DynamicHeteroGraphTemporalSignalBatch,
        StaticHeteroGraphTemporalSignalBatch,
    )

    n_a = 6
    ei = {("a", "to", "a"): np.stack([rng.integers(0, n_a, 8),
                                      rng.integers(0, n_a, 8)])}
    ew = {("a", "to", "a"): rng.uniform(size=8).astype(np.float32)}
    feats = [{"a": rng.uniform(size=(n_a, F)).astype(np.float32)}
             for _ in range(T)]
    targs = [{"a": rng.uniform(size=(n_a,)).astype(np.float32)}
             for _ in range(T)]
    batch = {"a": rng.integers(0, 2, size=(n_a,))}

    sig = StaticHeteroGraphTemporalSignalBatch(ei, ew, feats, targs, batch)
    snap = sig[0]
    assert snap.batch_dict["a"].shape == (n_a,)
    assert sig[2:5].snapshot_count == 3

    eis = [ei for _ in range(T)]
    ews = [ew for _ in range(T)]
    batches = [{"a": rng.integers(0, 2, size=(n_a,))} for _ in range(T)]
    sig2 = DynamicHeteroGraphTemporalSignalBatch(eis, ews, feats, targs, batches)
    for t, snap in enumerate(sig2):
        np.testing.assert_array_equal(snap.batch_dict["a"], batches[t]["a"])

    feat = {"a": rng.uniform(size=(n_a, F)).astype(np.float32)}
    sig3 = DynamicHeteroGraphStaticSignalBatch(eis, ews, feat, targs, batches)
    snap = sig3[1]
    np.testing.assert_allclose(snap.x_dict["a"], feat["a"])
    assert sig3[0:4].snapshot_count == 4


def test_hetero_static_signal(rng):
    from pytorch_geometric_temporal_tpu.signal import DynamicHeteroGraphStaticSignal

    n_a = 5
    eis = [{("a", "to", "a"): np.stack([rng.integers(0, n_a, 6),
                                        rng.integers(0, n_a, 6)])}
           for _ in range(T)]
    ews = [{("a", "to", "a"): rng.uniform(size=6).astype(np.float32)}
           for _ in range(T)]
    feat = {"a": rng.uniform(size=(n_a, F)).astype(np.float32)}
    targs = [{"a": rng.uniform(size=(n_a,)).astype(np.float32)}
             for _ in range(T)]
    sig = DynamicHeteroGraphStaticSignal(eis, ews, feat, targs)
    for snap in sig:
        np.testing.assert_allclose(snap.x_dict["a"], feat["a"])
    assert sig[1:3].snapshot_count == 2


def test_stacked_signal_batch_variants(rng):
    """StackedSignal carries the batch vector; scan's step gets it as the
    5th argument (static hoisted, dynamic riding the scan)."""
    ei, ew, feats, targs = generate_signal(rng)
    batch = rng.integers(0, 2, size=(N,))
    sig = StaticGraphTemporalSignalBatch(ei, ew, feats, targs, batch)
    st = StackedSignal.from_signal(sig)
    assert st.batches is not None and st.batches.shape == (N,)

    def step(carry, x, y, g, b):
        # per-graph mean via the batch vector (the reason batch exists)
        ones = jnp.zeros((2,)).at[b].add(1.0)
        sums = jnp.zeros((2, x.shape[-1])).at[b].add(x)
        return carry + sums / ones[:, None], None

    out, _ = jax.jit(lambda s: s.scan(step, jnp.zeros((2, F))))(st)
    want = np.zeros((2, F))
    for t in range(T):
        for gidx in range(2):
            want[gidx] += feats[t][batch == gidx].mean(0)
    np.testing.assert_allclose(out, want, rtol=1e-5)

    # dynamic variant: per-t batch rides the scan
    eis = [ei for _ in range(T)]
    ews = [ew for _ in range(T)]
    batches = [rng.integers(0, 2, size=(N,)) for _ in range(T)]
    sig2 = DynamicGraphTemporalSignalBatch(eis, ews, feats, targs, batches)
    st2 = StackedSignal.from_signal(sig2)
    assert st2.batches.shape == (T, N)

    def step2(carry, x, y, g, b):
        return carry + jnp.zeros((2,)).at[b].add(y), None

    out2, _ = jax.jit(lambda s: s.scan(step2, jnp.zeros((2,))))(st2)
    want2 = np.zeros((2,))
    for t in range(T):
        np.add.at(want2, batches[t], targs[t])
    np.testing.assert_allclose(out2, want2, rtol=1e-5)


def test_stacked_hetero_signal_batch(rng):
    from pytorch_geometric_temporal_tpu.signal import (
        StackedHeteroSignal,
        StaticHeteroGraphTemporalSignalBatch,
    )

    n_a, n_b = 6, 4
    ei = {("a", "to", "b"): np.stack([rng.integers(0, n_a, 9),
                                      rng.integers(0, n_b, 9)])}
    ew = {("a", "to", "b"): rng.uniform(size=9).astype(np.float32)}
    feats = [{"a": rng.uniform(size=(n_a, 3)).astype(np.float32),
              "b": rng.uniform(size=(n_b, 3)).astype(np.float32)}
             for _ in range(5)]
    targs = [{"b": rng.uniform(size=(n_b,)).astype(np.float32)}
             for _ in range(5)]
    batch = {"a": rng.integers(0, 2, size=(n_a,)),
             "b": rng.integers(0, 2, size=(n_b,))}
    sig = StaticHeteroGraphTemporalSignalBatch(ei, ew, feats, targs, batch)
    st = StackedHeteroSignal.from_signal(sig)
    assert set(st.batch_dicts) == {"a", "b"}

    def step(carry, xd, yd, graphs, bd):
        return carry + jnp.zeros((2,)).at[bd["b"]].add(yd["b"]), None

    out, _ = jax.jit(lambda s: s.scan(step, jnp.zeros((2,))))(st)
    want = np.zeros((2,))
    for t in range(5):
        np.add.at(want, batch["b"], targs[t]["b"])
    np.testing.assert_allclose(out, want, rtol=1e-5)
