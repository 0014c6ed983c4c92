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
