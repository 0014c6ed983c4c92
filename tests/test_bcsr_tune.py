"""BCSR spill-threshold autotuner (occupancy-histogram cost model)."""

import numpy as np
import jax.numpy as jnp

from pytorch_geometric_temporal_tpu.ops import BCSRMatrix, Graph, bcsr_spmm
from pytorch_geometric_temporal_tpu.ops.bcsr import (
    BLOCK,
    _round_up,
    bcsr_structure_counts,
    tune_min_block_edges,
)
from pytorch_geometric_temporal_tpu.ops.spmm import spmm_segment


def _banded(rng, n=4000, deg=20, band=64):
    e = n * deg
    s = rng.integers(0, n, size=e)
    r = np.clip(s + rng.integers(-band, band + 1, size=e), 0, n - 1)
    return np.stack([s, r])


def _counts(ei, n):
    n_pad = _round_up(n, BLOCK)
    nnzb, boe, _, _ = bcsr_structure_counts(
        np.ascontiguousarray(ei[0], np.int32),
        np.ascontiguousarray(ei[1], np.int32), BLOCK, n_pad // BLOCK)
    return np.bincount(boe, minlength=nnzb)


def test_banded_graph_keeps_all_tiles(rng):
    ei = _banded(rng)
    cnt = _counts(ei, 4000)
    theta = tune_min_block_edges(ei[1], ei[0], 4000, dtype=jnp.bfloat16)
    # band tiles are densely occupied: the tuner keeps every tile
    assert theta <= cnt.min()


def test_sparse_tiles_spill_under_storage_guard(rng):
    # ~1.3 edges per candidate tile: materializing all of them would cost
    # ~GBs; the tuner keeps at most the rare dense-enough tiles and spills
    # the overwhelming majority, staying within the storage guard
    n = 50_000
    ei = rng.integers(0, n, size=(2, 4 * n))
    cnt = _counts(ei, n)
    theta = tune_min_block_edges(ei[1], ei[0], n, dtype=jnp.bfloat16)
    kept = cnt >= theta
    assert kept.sum() * BLOCK * BLOCK * 2 <= 1 << 30  # storage guard holds
    assert kept.sum() < 0.01 * len(cnt)  # >99% of tiles spilled
    assert theta >= 8  # at/above the ~7.4-edge byte-model break-even


def test_mixed_graph_splits_at_occupancy_boundary(rng):
    """Dense band + sparse long-range edges: the tuner keeps the band tiles
    and spills the stragglers (threshold between the two populations)."""
    n = 4000
    band_ei = _banded(rng, n=n, deg=20, band=64)
    sparse_ei = rng.integers(0, n, size=(2, 2000))
    ei = np.concatenate([band_ei, sparse_ei], axis=1)
    theta = tune_min_block_edges(ei[1], ei[0], n, dtype=jnp.bfloat16,
                                 max_tile_bytes=8 << 20)
    cnt = _counts(ei, n)
    kept = (cnt >= theta).sum()
    assert 0 < kept < len(cnt)  # a real split, not all-or-nothing


def test_auto_build_is_numerically_identical(rng):
    n = 1500
    ei = _banded(rng, n=n, deg=10, band=32)
    w = rng.uniform(0.1, 1.0, ei.shape[1]).astype(np.float32)
    g = Graph.from_edge_index(ei, w, num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    auto = BCSRMatrix.from_graph(g, min_block_edges="auto")
    fixed = BCSRMatrix.from_graph(g, min_block_edges=32)
    ref = spmm_segment(g, x)
    for mat in (auto, fixed):
        np.testing.assert_allclose(
            np.asarray(bcsr_spmm(mat, x)), np.asarray(ref),
            rtol=2e-5, atol=2e-5,
        )


def test_tuner_cost_no_worse_than_default(rng):
    """On several graph families the tuner's modeled cost must be <= the
    fixed default's (same cost model, argmin by construction)."""

    def modeled_cost(cnt, e, theta, f=64):
        kept = cnt >= theta
        tile_bytes = BLOCK * BLOCK * 2 + BLOCK * f * 2
        edge_bytes = 2 * f * 4 * 13.0
        return kept.sum() * tile_bytes + (e - cnt[kept].sum()) * edge_bytes

    for ei, n in (
        (_banded(rng), 4000),
        (rng.integers(0, 4000, size=(2, 80_000)), 4000),
    ):
        cnt = _counts(ei, n)
        theta = tune_min_block_edges(ei[1], ei[0], n, dtype=jnp.bfloat16)
        assert (modeled_cost(cnt, ei.shape[1], theta)
                <= modeled_cost(cnt, ei.shape[1], 32) + 1e-6)
