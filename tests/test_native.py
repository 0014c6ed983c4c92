"""Native (C++) preprocessing: compile, load, and match numpy fallbacks."""

import numpy as np
import pytest

from pytorch_geometric_temporal_tpu import native


def test_native_lib_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no g++ toolchain available")
    assert hasattr(lib, "csr_from_coo")


def _numpy_versions(monkeypatch_none=False):
    pass


def test_csr_from_coo_matches_numpy(rng, monkeypatch):
    recv = rng.integers(0, 50, size=500).astype(np.int32)
    indptr, order = native.csr_from_coo(recv, 50)
    # fallback path
    monkeypatch.setattr(native, "get_lib", lambda: None)
    indptr2, order2 = native.csr_from_coo(recv, 50)
    np.testing.assert_array_equal(indptr, indptr2)
    np.testing.assert_array_equal(recv[order], recv[order2])
    assert np.all(np.diff(recv[order]) >= 0)  # sorted by receiver
    assert indptr[-1] == 500


def test_bcsr_structure_matches_numpy(rng, monkeypatch):
    s = rng.integers(0, 400, size=3000).astype(np.int32)
    r = rng.integers(0, 400, size=3000).astype(np.int32)
    w = rng.uniform(size=3000).astype(np.float32)
    grid = 4  # 400 nodes, block 128 -> ceil = 4 blocks
    nnzb, boe, trows, tcols = native.bcsr_structure(s, r, 128, grid)
    tiles = native.bcsr_fill(s, r, w, boe, 128, nnzb)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    nnzb2, boe2, trows2, tcols2 = native.bcsr_structure(s, r, 128, grid)
    tiles2 = native.bcsr_fill(s, r, w, boe2, 128, nnzb2)
    assert nnzb == nnzb2
    np.testing.assert_array_equal(trows, trows2)
    np.testing.assert_array_equal(tcols, tcols2)
    np.testing.assert_allclose(tiles, tiles2, atol=1e-6)


def test_partition_edges_matches_numpy(rng, monkeypatch):
    r = rng.integers(0, 64, size=1000).astype(np.int32)
    counts, order = native.partition_edges(r, 16, 4)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    counts2, order2 = native.partition_edges(r, 16, 4)
    np.testing.assert_array_equal(counts, counts2)
    np.testing.assert_array_equal((r // 16)[order], (r // 16)[order2])
    assert counts.sum() == 1000


def test_native_disabled_env(monkeypatch):
    monkeypatch.setenv("PGT_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    assert native.get_lib() is None
    # restore module state for other tests
    monkeypatch.setattr(native, "_TRIED", False)


def test_rcm_order_is_permutation_and_reduces_bandwidth(rng, monkeypatch):
    n = 600
    s = rng.integers(0, n, 4000)
    r = np.clip(s + rng.integers(-10, 11, 4000), 0, n - 1)
    scram = rng.permutation(n)
    ss, rr = scram[s].astype(np.int32), scram[r].astype(np.int32)

    def bandwidth(perm):
        ip = np.empty_like(perm)
        ip[perm] = np.arange(n, dtype=np.int32)
        return int(np.abs(ip[ss].astype(np.int64) - ip[rr]).max())

    p_native = native.rcm_order(ss, rr, n)
    assert sorted(p_native) == list(range(n))
    assert bandwidth(p_native) < bandwidth(np.arange(n, dtype=np.int32)) / 5
    # numpy fallback agrees on quality (not necessarily on the exact order)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    import builtins
    real_import = builtins.__import__

    def no_scipy(name, *a, **k):
        if name.startswith("scipy"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_scipy)
    p_np = native.rcm_order(ss, rr, n)
    assert sorted(p_np) == list(range(n))
    assert bandwidth(p_np) < bandwidth(np.arange(n, dtype=np.int32)) / 5


def test_edge_triangle_support_matches_scipy(rng, monkeypatch):
    n = 400
    s = rng.integers(0, n, 3000).astype(np.int32)
    r = np.clip(s + rng.integers(-8, 9, 3000), 0, n - 1).astype(np.int32)
    sup_native = native.edge_triangle_support(s, r, n)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    sup_scipy = native.edge_triangle_support(s, r, n)
    np.testing.assert_array_equal(sup_native, sup_scipy)


def test_bandwidth_reduction_order_filters_shortcuts():
    """With 5% random shortcuts the filtered ordering must spill far fewer
    edges than unfiltered RCM (the measured motivation for the filter:
    2.25-2.3x at this scale across seeds; the effect needs enough nodes
    for BFS shortcut-tunneling to hurt, hence n=20k)."""
    from pytorch_geometric_temporal_tpu.ops.bcsr import (
        _round_up,
        bcsr_structure_counts,
    )

    rng = np.random.default_rng(1)
    n, deg, band = 20_000, 40, 96
    e = n * deg
    e_loc = int(e * 0.95)
    s = rng.integers(0, n, e_loc)
    r = np.clip(s + rng.integers(-band, band + 1, e_loc), 0, n - 1)
    s = np.concatenate([s, rng.integers(0, n, e - e_loc)])
    r = np.concatenate([r, rng.integers(0, n, e - e_loc)])
    scram = rng.permutation(n)
    s, r = scram[s].astype(np.int32), scram[r].astype(np.int32)

    def spilled(perm, theta=24):
        ip = np.empty_like(perm)
        ip[perm] = np.arange(n, dtype=np.int32)
        nnzb, boe, _, _ = bcsr_structure_counts(
            ip[s], ip[r], 128, _round_up(n, 128) // 128
        )
        cnt = np.bincount(boe, minlength=nnzb)
        return int(cnt[cnt < theta].sum())

    plain = spilled(native.rcm_order(s, r, n))
    filtered = spilled(native.bandwidth_reduction_order(s, r, n))
    assert filtered < plain / 1.5, (filtered, plain)
