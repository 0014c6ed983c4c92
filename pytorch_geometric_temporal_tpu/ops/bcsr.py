"""Block-sparse (BCSR) matrices + Pallas TPU SpMM kernels.

For graphs past the dense threshold (e.g. all-California PeMS, 11160 nodes —
reference ``examples/indexBatching/DCRNN/pems_main.py:142``) a dense (N, N)
adjacency means ~500 MB of HBM traffic per aggregation.  Real road networks
are locally clustered, so tiling the aggregation matrix ``M[r, s] = w(s→r)``
into 128×128 blocks and storing only nonzero blocks cuts that traffic by the
block sparsity while every FLOP still lands on the MXU.

Two Pallas kernels cover the hybrid operator:

- **Tile kernel**: grid over row-sorted steps of ``pack`` same-row tiles
  each (scalar-prefetched block indices; packing amortizes the measured
  ~254 ns fixed cost per Mosaic grid step).  The output block stays
  resident in VMEM across consecutive same-row steps (revisiting
  accumulation) and tiles/X column-blocks stream in via the BlockSpec
  pipeline.  Dummy slots (the shared trailing zero tile) pad short rows
  and guarantee every output block is written — no undefined memory, no
  select-mask epilogue.
- **Remainder scatter kernel**: edges from sub-threshold blocks (the COO
  remainder) are grouped by row block into fixed-size chunks; their source
  rows are gathered by XLA (``x[rem_cols]``), and the scatter-accumulate —
  the measured bottleneck of ``jax.ops.segment_sum`` on TPU, which is
  per-row latency-bound — becomes a per-chunk MXU matmul
  ``onehot(local_rows)·vals @ msgs`` accumulated into the VMEM-resident
  output block.  The tile kernel's output is threaded through via
  ``input_output_aliases`` so row blocks without remainder edges keep
  their tile values with zero extra traffic.

Gradients: custom VJP using the transposed BCSR structure (built at
construction), so ``d/dX spmm(M, X) = spmm(Mᵀ, ḡ)`` is another kernel
call.  Block *values* are treated as constants (normalized adjacencies are
not trained in this model family).
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph

BLOCK = 128
# remainder edges per scatter-kernel step (one (BLOCK, REM_K) x (REM_K, F)
# MXU matmul each); per-row-block padding waste averages REM_K/2 edges.
REM_K = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "block_rows", "block_cols",
                 "step_rows", "step_cols", "step_bidx",
                 "rem_cols", "rem_vals", "rem_lrows", "rem_step_rb"],
    meta_fields=["num_rows", "num_cols", "nnzb", "num_rem", "pack"],
)
@dataclasses.dataclass(frozen=True)
class _BCSRHalf:
    """One direction of the hybrid block-sparse operator.

    Blocks with at least ``min_block_edges`` edges are stored dense (the
    MXU path); edges landing in sparser blocks spill to a COO *remainder*
    handled by the gather + one-hot-matmul scatter kernel.  Without the
    split, a handful of long-range edges each allocate a whole 128×128
    tile and block HBM traffic dwarfs the useful bytes (0.6% in-tile
    occupancy measured on a clustered 50k/2M graph with 1% random edges).

    Tile fields: ``blocks`` holds the ``nnzb`` real tiles plus ONE trailing
    all-zero tile (index ``nnzb``) used by dummy slots; ``step_*`` arrays
    drive the kernel grid — each step covers ``pack`` same-row slots
    (real tiles in row-sorted order, zero-tile slots padding short rows
    and rows no tile covers; see :func:`_build_steps`).

    Remainder fields (padded per row block to a multiple of ``rem_k``,
    default ``REM_K``): ``rem_cols`` (P,) gather sources,
    ``rem_vals``/``rem_lrows``
    (S_r, rem_k) per-chunk edge values / within-block row ids,
    ``rem_step_rb`` (S_r,) the row block each chunk accumulates into.
    Padding edges have val 0 (col 0, lrow 0) so they contribute nothing.
    """

    blocks: jnp.ndarray       # (nnzb + 1, BLOCK, BLOCK); [-1] is all-zero
    block_rows: jnp.ndarray   # (nnzb,) int32, sorted ascending (real tiles)
    block_cols: jnp.ndarray   # (nnzb,) int32
    # step arrays are FLAT 1D: 2D scalar-prefetch operands are padded to
    # 128 SMEM lanes (measured 588 KB for an (S, 1) i32 at S=1171 — SMEM
    # is 1 MB total); slot u of step k lives at index k·pack + u.
    step_rows: jnp.ndarray    # (S,) int32 kernel-step row blocks, sorted
    step_cols: jnp.ndarray    # (S·pack,) int32
    step_bidx: jnp.ndarray    # (S·pack,) int32 into blocks (nnzb = dummy)
    rem_cols: jnp.ndarray     # (S_r * REM_K,) int32 gather sources
    rem_vals: jnp.ndarray     # (S_r, REM_K) f32 edge values (0 = padding)
    rem_lrows: jnp.ndarray    # (S_r, REM_K) int32 row within the row block
    rem_step_rb: jnp.ndarray  # (S_r,) int32 row block per chunk, sorted
    num_rows: int             # padded row count (multiple of BLOCK)
    num_cols: int
    nnzb: int                 # real tile count (may be 0)
    num_rem: int              # real remainder edge count (may be 0)
    pack: int = 1             # tiles per tile-kernel grid step

    @property
    def rem_rows(self) -> jnp.ndarray:
        """(S_r * REM_K,) int32 global row ids (derived; XLA fallback)."""
        return (self.rem_step_rb[:, None] * BLOCK
                + self.rem_lrows).reshape(-1)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd", "perm", "iperm"],
    meta_fields=["num_nodes"],
)
@dataclasses.dataclass(frozen=True)
class BCSRMatrix:
    """Forward + transposed block-sparse aggregation operator.

    When built with ``reorder=``, ``perm``/``iperm`` hold the node
    relabeling (``perm[new] = old``, padded with identity up to the padded
    row count) and :func:`bcsr_spmm` permutes inputs / un-permutes outputs
    transparently — callers see original node ids.
    """

    fwd: _BCSRHalf
    bwd: _BCSRHalf
    num_nodes: int  # original (unpadded)
    perm: Optional[jnp.ndarray] = None   # (num_rows,) int32, perm[new]=old
    iperm: Optional[jnp.ndarray] = None  # (num_rows,) int32, iperm[old]=new

    @staticmethod
    def from_graph(graph: Graph, block: int = BLOCK, dtype=None,
                   min_block_edges=32, expected_f: int = 64,
                   pack="auto", rem_k: int = REM_K,
                   reorder=None) -> "BCSRMatrix":
        """Host-side construction from a Graph (aggregation M[r,s] = w).

        ``dtype=jnp.bfloat16`` stores tiles in bf16 — halves HBM traffic for
        the kernel (accumulation stays f32); default keeps f32 tiles.

        ``min_block_edges``: blocks with fewer edges spill their edges to
        the COO remainder path instead of materializing a dense tile.
        ``'auto'`` picks the threshold from the graph's measured block-
        occupancy histogram via :func:`tune_min_block_edges` (uses
        ``expected_f``, the typical feature width, in its measured time
        model); an int fixes it (the measured break-even is ~17
        edges/tile at F=64 bf16; the default 32 leaves margin); 0
        disables the split.

        ``pack``: tiles multiplied per tile-kernel grid step (see
        :func:`_build_steps` — amortizes the measured ~290 ns/step fixed
        cost; rows pad to a multiple of ``pack`` with zero-tile slots).
        ``'auto'`` picks per direction via :func:`tune_pack`'s measured
        cost model (v5e: 2.1× on the 50k banded bench vs ``pack=1``).

        ``rem_k``: remainder edges per scatter-kernel chunk; larger
        chunks amortize the same per-step cost against per-row-block
        padding waste (averaging ``rem_k/2`` edges).

        ``reorder``: host-side bandwidth-reduction node relabeling before
        tiling.  ``'rcm'`` applies reverse Cuthill-McKee (native C++ with
        scipy/numpy fallbacks); ``'auto'`` measures the cost model on
        both orderings — including the per-call input/output gather the
        relabeling adds — and keeps the cheaper; ``None`` (default)
        preserves caller ordering.  Attacks the remainder when the
        caller's node ids scatter a structurally-banded graph across
        blocks (arbitrary sensor ids over a road network); a graph whose
        spilled edges are *structurally* long-range gains nothing, which
        is what ``'auto'`` detects.  Replaces nothing in the reference —
        its per-edge scatter (``nn/recurrent/dcrnn.py:86-106``) is
        ordering-indifferent.
        """
        e = graph.num_edges
        s_all, r_all, w_all = graph.host_edges()
        s = np.asarray(s_all)[:e]
        r = np.asarray(r_all)[:e]
        w = np.asarray(w_all)[:e].copy()
        n = graph.num_nodes
        perm = iperm = None
        if reorder not in (None, "rcm", "auto"):
            raise ValueError(f"reorder must be None|'rcm'|'auto', "
                             f"got {reorder!r}")
        if reorder is not None and n > block and e > 0:
            from ..native import bandwidth_reduction_order

            p = bandwidth_reduction_order(s, r, n)
            ip = np.empty_like(p)
            ip[p] = np.arange(n, dtype=np.int32)
            s_new, r_new = ip[s], ip[r]
            keep = reorder == "rcm" or _reorder_pays_off(
                r, s, r_new, s_new, n, block, dtype, expected_f,
                min_block_edges,
            )
            if keep:
                s, r = s_new, r_new
                n_pad = _round_up(n, block)
                perm = np.concatenate(
                    [p, np.arange(n, n_pad, dtype=np.int32)]
                )
                iperm = np.concatenate(
                    [ip, np.arange(n, n_pad, dtype=np.int32)]
                )
        if min_block_edges == "auto":
            min_block_edges = tune_min_block_edges(
                r, s, n, block, dtype, expected_f
            )
        return BCSRMatrix(
            fwd=_build_half(r, s, w, n, block, dtype, min_block_edges, pack,
                            rem_k),
            bwd=_build_half(s, r, w, n, block, dtype, min_block_edges, pack,
                            rem_k),
            num_nodes=n,
            perm=None if perm is None else jnp.asarray(perm),
            iperm=None if iperm is None else jnp.asarray(iperm),
        )

    @property
    def density(self) -> float:
        nb = self.fwd.num_rows // BLOCK
        return self.fwd.nnzb / max(nb * (self.fwd.num_cols // BLOCK), 1)


# Measured v5e kernel-time constants (see benchmarks/bcsr_tuner_sweep.py
# for the on-device validation):
#   C_TILE  — per kept tile at pack=4: 254 ns/step ÷ 4 + 39 ns/slot DMA.
#   C_EDGE  — per spilled edge: XLA row-gather runs at a FIXED ~2 ns/row
#             regardless of index pattern (measured 65 GB/s on 128 B rows
#             even for sequential indices — per-index rate-bound, not
#             bandwidth-bound) + ~2.9 ns/edge in the one-hot scatter
#             kernel, ×1.24 average chunk padding.
C_TILE_NS = 254.0 / 4 + 39.0
C_EDGE_NS = (2.0 + 2.9) * 1.24


def tune_min_block_edges(rows, cols, n, block=BLOCK, dtype=None,
                         expected_f: int = 64,
                         tile_ns: float = C_TILE_NS,
                         edge_ns: float = C_EDGE_NS,
                         max_tile_bytes: int = 1 << 30,
                         _return_cost: bool = False,
                         _fixed_theta=None):
    """Pick the tile/COO spill threshold from the measured occupancy histogram.

    Cost model (device TIME, measured constants above): a kept tile costs
    ``tile_ns`` (grid step share + tile/X DMA at the achieved bandwidth),
    a spilled edge costs ``edge_ns`` (rate-bound XLA row gather + one-hot
    scatter).  ``expected_f``/dtype scale the tile's DMA share: wider or
    f32 features raise both paths roughly proportionally, so the
    break-even θ ≈ tile_ns/edge_ns ≈ 17 edges/tile at F=64 bf16 moves
    only mildly; the constants were fitted at F=64 bf16.

    For every candidate threshold θ (the distinct occupancy counts), total
    cost = kept_tiles(θ)·tile_ns + spilled_edges(θ)·edge_ns, subject to a
    storage guard: kept tiles may not exceed ``max_tile_bytes`` of HBM
    (prevents a huge uniform-random graph from materializing gigabytes of
    nearly-empty tiles).  Returns the argmin θ.
    """
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    n_pad = _round_up(max(n, 1), block)
    nnzb, block_of_edge, _, _ = bcsr_structure_counts(cols, rows, block,
                                                      n_pad // block)
    e = len(rows)
    if nnzb == 0 or e == 0:
        return (0, 0.0) if _return_cost else 0
    cnt = np.bincount(block_of_edge, minlength=nnzb)
    s_tile = 2 if dtype == jnp.bfloat16 else 4
    # scale the tile's DMA share for wider-than-fitted X tiles (the fit
    # point is F=64 bf16: 39 ns/slot ≈ 32 KB tile + 16 KB X at ~1.2 TB/s
    # effective pipeline bandwidth)
    f_eff = expected_f if expected_f <= 128 else _round_up(expected_f, 128)
    dma_scale = (block * block * s_tile + block * f_eff * s_tile) / 49152.0
    t_tile = (tile_ns - 39.0) + 39.0 * dma_scale
    order = np.sort(cnt)
    # candidate thresholds: each distinct count (+inf == spill everything);
    # a _fixed_theta evaluates ONLY that threshold (cost-at-theta query)
    if _fixed_theta is not None:
        cands = np.asarray([_fixed_theta])
    else:
        cands = np.unique(np.concatenate([order, [order[-1] + 1]]))
    # suffix sums: edges kept when threshold == c
    csum = np.cumsum(order)
    total = csum[-1]
    best_theta, best_cost = int(cands[-1]), np.inf
    for theta in cands:
        k = np.searchsorted(order, theta, side="left")
        kept_tiles = len(order) - k
        kept_edges = total - (csum[k - 1] if k > 0 else 0)
        if kept_tiles * block * block * s_tile > max_tile_bytes:
            continue
        cost = kept_tiles * t_tile + (e - kept_edges) * edge_ns
        if cost < best_cost:
            best_cost, best_theta = cost, int(theta)
    if _return_cost:
        return best_theta, best_cost
    return best_theta


def _reorder_pays_off(r0, s0, r1, s1, n, block, dtype, expected_f,
                      min_block_edges="auto") -> bool:
    """Cost-model decision for ``reorder='auto'``: does the relabeled
    ordering beat the caller's, once the permutation's own per-call price
    (an input gather and an output un-gather, both rate-bound at the same
    ~2 ns/row as the remainder gather) is charged against it?

    The comparison runs at the spill threshold the operator will actually
    be BUILT with: the caller's fixed ``min_block_edges``, or (for
    ``'auto'``) each ordering's own tuned optimum — a decision at a
    different threshold could keep a permutation that loses at the built
    one."""
    fixed = None if min_block_edges == "auto" else int(min_block_edges)
    _, cost0 = tune_min_block_edges(r0, s0, n, block, dtype, expected_f,
                                    _return_cost=True, _fixed_theta=fixed)
    _, cost1 = tune_min_block_edges(r1, s1, n, block, dtype, expected_f,
                                    _return_cost=True, _fixed_theta=fixed)
    gather_ns = 2.0 * _round_up(n, block) * 2
    return cost1 + gather_ns < cost0


def bcsr_structure_counts(cols, rows, block, grid_cols):
    """Structure pass only (no tile fill): delegates to the native helper."""
    from ..native import bcsr_structure

    return bcsr_structure(cols, rows, block, grid_cols)


def _build_remainder(rows, cols, vals, nb, block, rem_k=REM_K):
    """Group remainder edges by row block into REM_K-edge padded chunks.

    Returns (rem_cols, rem_vals, rem_lrows, rem_step_rb) with one chunk
    per (row block, REM_K window); only row blocks that have remainder
    edges get chunks (the scatter kernel's aliased output leaves the rest
    untouched).  Edges arrive row-sorted; padding edges (val 0) trail
    inside each chunk.
    """
    # sort by (row block, col): the gather of x[rem_cols] then walks each
    # chunk's source rows in ascending address order (locality for the
    # XLA row-gather)
    order = np.lexsort((cols, rows // block))
    rows, cols, vals = rows[order], cols[order], vals[order]
    rb_of_edge = rows // block
    rbs, counts = np.unique(rb_of_edge, return_counts=True)
    chunks_per_rb = -(-counts // rem_k)
    s_r = int(chunks_per_rb.sum())
    p = s_r * rem_k
    rem_cols = np.zeros((p,), np.int32)
    rem_vals = np.zeros((p,), np.float32)
    rem_lrows = np.zeros((p,), np.int32)
    rem_step_rb = np.repeat(rbs, chunks_per_rb).astype(np.int32)
    src = 0
    dst = 0
    for rb, cnt, nch in zip(rbs, counts, chunks_per_rb):
        rem_cols[dst:dst + cnt] = cols[src:src + cnt]
        rem_vals[dst:dst + cnt] = vals[src:src + cnt]
        rem_lrows[dst:dst + cnt] = rows[src:src + cnt] - rb * block
        src += cnt
        dst += nch * rem_k
    return (rem_cols, rem_vals.reshape(s_r, rem_k),
            rem_lrows.reshape(s_r, rem_k), rem_step_rb)


def _build_steps(block_rows, block_cols, nb, pack: int = 1):
    """Packed kernel step list: ``pack`` same-row tiles per grid step.

    The tile kernel's measured cost is ~290 ns per grid step on v5e —
    ~5× the HBM time of the 48 KB a step moves — so grid-step overhead,
    not bandwidth, binds the kernel.  Packing amortizes it: each step
    multiplies ``pack`` tiles of ONE row block (accumulation stays
    correct), with rows padded to a multiple of ``pack`` using dummy
    slots (the trailing zero tile, col 0).  Every row block gets at least
    one step so all output blocks are written.

    Returns ``(step_rows (S,), step_cols (S·pack,), step_bidx (S·pack,))``
    — slot arrays stay FLAT (2D scalar-prefetch operands pad to 128 SMEM
    lanes) — with steps sorted by row.  ``block_rows`` must be sorted
    ascending.
    """
    nnzb = len(block_rows)
    tile_cnt = np.bincount(block_rows, minlength=nb) if nnzb else \
        np.zeros(nb, np.int64)
    groups = np.maximum(-(-tile_cnt // pack), 1)
    s = int(groups.sum())
    step_rows = np.repeat(np.arange(nb, dtype=np.int32), groups)
    flat_bidx = np.full(s * pack, nnzb, np.int32)
    flat_cols = np.zeros(s * pack, np.int32)
    if nnzb:
        slot_start = np.zeros(nb, np.int64)
        slot_start[1:] = np.cumsum(groups * pack)[:-1]
        row_start_tile = np.zeros(nb, np.int64)
        row_start_tile[1:] = np.cumsum(tile_cnt)[:-1]
        tile_slot = (slot_start[block_rows]
                     + (np.arange(nnzb) - row_start_tile[block_rows]))
        flat_bidx[tile_slot] = np.arange(nnzb, dtype=np.int32)
        flat_cols[tile_slot] = block_cols
    return step_rows, flat_cols, flat_bidx


def tune_pack(tile_cnt, candidates=(1, 2, 3, 4, 6, 8),
              c_step: float = 254e-9, c_slot: float = 39e-9) -> int:
    """Pick the tiles-per-step packing from the per-row tile histogram.

    Cost model fitted on v5e measurements (50k banded bench, F=64 bf16):
    a grid step costs ~254 ns fixed (scalar bookkeeping + pipeline
    serialization) plus ~39 ns per packed slot (tile + X DMA at the
    achieved bandwidth).  Total = Σ_rows ceil(cnt/p)·(c_step + p·c_slot);
    dummy slots in short rows pay DMA for the shared zero tile, which the
    p·c_slot term charges.  Measured: pack=4 is 2.1× pack=1 on rows of
    ~3 tiles; pack=8 regresses (63% dummy slots).
    """
    best_p, best_cost = 1, float("inf")
    for p in candidates:
        groups = np.maximum(-(-tile_cnt // p), 1)
        cost = float(groups.sum()) * (c_step + p * c_slot)
        if cost < best_cost:
            best_p, best_cost = p, cost
    return int(best_p)


def _build_half(rows, cols, vals, n, block, dtype=None,
                min_block_edges: int = 0, pack="auto",
                rem_k: int = REM_K) -> _BCSRHalf:
    from ..native import bcsr_fill, bcsr_structure

    n_pad = _round_up(max(n, 1), block)
    nb = n_pad // block
    grid_cols = nb
    # sender=cols (within-block col index), receiver=rows (row index)
    nnzb, block_of_edge, block_rows, block_cols = bcsr_structure(
        cols, rows, block, grid_cols
    )

    rem = (np.zeros((0,), np.int32), np.zeros((0, rem_k), np.float32),
           np.zeros((0, rem_k), np.int32), np.zeros((0,), np.int32))
    num_rem = 0
    if min_block_edges > 1 and nnzb > 0:
        cnt = np.bincount(block_of_edge, minlength=nnzb)
        edge_is_sparse = (cnt < min_block_edges)[block_of_edge]
        num_rem = int(edge_is_sparse.sum())
        if num_rem:
            rem = _build_remainder(
                rows[edge_is_sparse].astype(np.int32),
                cols[edge_is_sparse].astype(np.int32),
                vals[edge_is_sparse].astype(np.float32),
                nb, block, rem_k,
            )
            keep = ~edge_is_sparse
            rows, cols, vals = rows[keep], cols[keep], vals[keep]
            nnzb, block_of_edge, block_rows, block_cols = (
                bcsr_structure(cols, rows, block, grid_cols)
            )

    if nnzb == 0:
        block_rows = np.zeros((0,), np.int32)
        block_cols = np.zeros((0,), np.int32)
    tiles = bcsr_fill(cols, rows, vals, block_of_edge, block, max(nnzb, 1))
    if nnzb == 0:
        tiles = tiles[:0]
    # trailing all-zero tile for dummy steps
    blocks = np.concatenate(
        [tiles, np.zeros((1, block, block), tiles.dtype)], axis=0
    )
    if dtype is not None:
        blocks = blocks.astype(dtype)
    if pack == "auto":
        pack = tune_pack(
            np.bincount(block_rows, minlength=nb) if nnzb
            else np.zeros(nb, np.int64)
        )
    step_rows, step_cols, step_bidx = _build_steps(
        block_rows, block_cols, nb, pack
    )
    rem_cols, rem_vals, rem_lrows, rem_step_rb = rem
    host = {
        "blocks": blocks, "block_rows": block_rows,
        "block_cols": block_cols, "step_rows": step_rows,
        "step_cols": step_cols, "step_bidx": step_bidx,
        "rem_cols": rem_cols, "rem_vals": rem_vals,
        "rem_lrows": rem_lrows, "rem_step_rb": rem_step_rb,
    }
    half = _BCSRHalf(
        blocks=jnp.asarray(blocks),
        block_rows=jnp.asarray(block_rows),
        block_cols=jnp.asarray(block_cols),
        step_rows=jnp.asarray(step_rows),
        step_cols=jnp.asarray(step_cols),
        step_bidx=jnp.asarray(step_bidx),
        rem_cols=jnp.asarray(rem_cols),
        rem_vals=jnp.asarray(rem_vals),
        rem_lrows=jnp.asarray(rem_lrows),
        rem_step_rb=jnp.asarray(rem_step_rb),
        num_rows=n_pad,
        num_cols=n_pad,
        nnzb=int(nnzb),
        num_rem=num_rem,
        pack=int(pack),
    )
    # host-side originals cached OUTSIDE the pytree: stack_bcsr pads and
    # stacks from these, because device→host fetches are glacial on
    # tunneled platforms (~seconds per array) — same pattern as
    # Graph.host_edges
    object.__setattr__(half, "_host", host)
    return half


def _f_layout(x, f_tile):
    """Feature-axis tiling; returns (x, f_pad, f_tiles, f_tile).

    For f <= 128 the array is NOT padded: Mosaic accepts a block whose
    last dim equals the full array dim, and at the bench's f=64 padding to
    128 lanes would double every byte of gather/scatter/output traffic for
    zeros (measured ~25% end-to-end on the 50k hybrid).  Wider features
    tile at ``f_tile`` (128-aligned) to bound VMEM.
    """
    f = x.shape[-1]
    if f <= 128:
        return x, f, 1, f
    f_pad = _round_up(f, 128)
    f_tile = min(_round_up(f_tile, 128), f_pad)
    if f_pad % f_tile:
        f_pad = _round_up(f_pad, f_tile)
    if f_pad != f:
        x = jnp.pad(x, ((0, 0), (0, f_pad - f)))
    return x, f_pad, f_pad // f_tile, f_tile


def _compiler_params():
    # F tiles are independent ('parallel'); the step sweep must stay in
    # order ('arbitrary') for the revisiting accumulation.
    from jax.experimental.pallas import tpu as pltpu

    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    except TypeError:  # pragma: no cover - older pallas versions
        return None


def _tile_kernel_call(half: _BCSRHalf, x: jnp.ndarray, f_pad: int,
                      f_tiles: int, f_tile: int, interpret: bool):
    """out (num_rows, f_pad) f32 = Σ_steps Σ_u blocks[bidx[k,u]] @ x[col].

    Grid: (f_tiles, S) — F outermost so that, per F tile, the steps sweep
    in row-sorted order and the output tile stays VMEM-resident across
    consecutive same-row steps.  Each step multiplies ``pack`` tiles of
    one row block (the blocks/x arrays are passed ``pack`` times with
    per-slot index maps — measured ~290 ns of fixed per-grid-step cost
    makes one-tile steps overhead-bound).  Dummy slots (bidx == nnzb, the
    zero tile) pad short rows and zero-define row blocks no tile covers.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pack = half.pack

    def kernel(rows_ref, cols_ref, bidx_ref, *refs):
        o_ref = refs[-1]
        k = pl.program_id(1)
        prev = rows_ref[jnp.maximum(k - 1, 0)]
        is_first = jnp.logical_or(k == 0, rows_ref[k] != prev)

        @pl.when(is_first)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        acc = jnp.dot(refs[0][0], refs[pack][:],
                      preferred_element_type=jnp.float32)
        for u in range(1, pack):
            acc += jnp.dot(refs[u][0], refs[pack + u][:],
                           preferred_element_type=jnp.float32)
        o_ref[:] += acc

    in_specs = [
        pl.BlockSpec(
            (1, BLOCK, BLOCK),
            lambda j, k, rows, cols, bidx, u=u: (bidx[k * pack + u], 0, 0),
        )
        for u in range(pack)
    ] + [
        pl.BlockSpec(
            (BLOCK, f_tile),
            lambda j, k, rows, cols, bidx, u=u: (cols[k * pack + u], j),
        )
        for u in range(pack)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(f_tiles, half.step_rows.shape[0]),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BLOCK, f_tile), lambda j, k, rows, cols, bidx: (rows[k], j)
        ),
    )
    cp = _compiler_params()
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((half.num_rows, f_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        **({"compiler_params": cp} if cp else {}),
    )(half.step_rows, half.step_cols, half.step_bidx,
      *([half.blocks] * pack), *([x] * pack))


def _rem_scatter_call(half: _BCSRHalf, xg: jnp.ndarray, base: jnp.ndarray,
                      f_pad: int, f_tiles: int, f_tile: int,
                      interpret: bool):
    """base += scatter(remainder) via one-hot MXU matmuls.

    ``xg`` (S_r·REM_K, f_pad) are the gathered source rows (XLA gather —
    fast at row granularity); the scatter-accumulate that stalls
    ``segment_sum`` becomes ``onehot(lrows)·vals @ xg_chunk`` per chunk,
    accumulated in the VMEM-resident output block.  ``base`` (the tile
    kernel's output) is aliased to the output, so row blocks without
    remainder chunks keep their values with no copy traffic.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = xg.dtype
    rem_k = int(half.rem_vals.shape[1])

    def kernel(rb_ref, xg_ref, lrows_ref, lvals_ref, base_ref, o_ref):
        k = pl.program_id(1)
        prev = rb_ref[jnp.maximum(k - 1, 0)]
        is_first = jnp.logical_or(k == 0, rb_ref[k] != prev)

        @pl.when(is_first)
        def _():
            o_ref[:] = base_ref[:]

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, rem_k), 0)
        onehot = jnp.where(row_ids == lrows_ref[0, 0][None, :],
                           lvals_ref[0, 0][None, :], 0.0)
        o_ref[:] += jnp.dot(onehot.astype(dt), xg_ref[:],
                            preferred_element_type=jnp.float32)

    s_r = half.rem_step_rb.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_tiles, s_r),
        in_specs=[
            pl.BlockSpec((rem_k, f_tile), lambda j, k, rb: (k, j)),
            # (1, 1, REM_K) blocks: TPU lowering requires the last two
            # block dims be (8k, 128k)-divisible OR equal to the array
            # dims — the leading-1 3D layout satisfies the latter.
            pl.BlockSpec((1, 1, rem_k), lambda j, k, rb: (k, 0, 0)),
            pl.BlockSpec((1, 1, rem_k), lambda j, k, rb: (k, 0, 0)),
            pl.BlockSpec((BLOCK, f_tile), lambda j, k, rb: (rb[k], j)),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, f_tile), lambda j, k, rb: (rb[k], j)
        ),
    )
    cp = _compiler_params()
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((half.num_rows, f_pad), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # base (arg 4 incl. prefetch) -> out
        interpret=interpret,
        **({"compiler_params": cp} if cp else {}),
    )(half.rem_step_rb, xg,
      half.rem_lrows[:, None, :], half.rem_vals[:, None, :], base)


def _bcsr_matmul_pallas(half: _BCSRHalf, x: jnp.ndarray,
                        interpret: bool = False,
                        f_tile: int = 512) -> jnp.ndarray:
    """out (num_rows, F) = tiles @ x + remainder scatter; x: (num_cols, F)."""
    f = x.shape[-1]
    x, f_pad, f_tiles, f_tile = _f_layout(x, f_tile)
    if half.blocks.dtype == jnp.bfloat16:
        # bf16 tiles ⇒ stream bf16 feature tiles too (halves x traffic);
        # the MXU multiplies bf16×bf16 natively, accumulation stays f32.
        x = x.astype(jnp.bfloat16)
    out = _tile_kernel_call(half, x, f_pad, f_tiles, f_tile, interpret)
    if half.num_rem:
        xg = x[half.rem_cols]
        out = _rem_scatter_call(half, xg, out, f_pad, f_tiles, f_tile,
                                interpret)
    return out[:, :f]


def _remainder_xla(half: _BCSRHalf, x: jnp.ndarray) -> Optional[jnp.ndarray]:
    """COO remainder on the XLA path (gather + segment-sum); None if empty.

    ``rem_rows`` is row-block-sorted by construction with in-chunk padding
    rows pointing inside the same block, so ``indices_are_sorted`` is only
    safe per-block — pass False (the XLA path is the portability fallback,
    not the fast path)."""
    if half.num_rem == 0:
        return None
    if half.blocks.dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    vals = half.rem_vals.reshape(-1)
    msgs = x[half.rem_cols].astype(jnp.float32) * vals[:, None]
    return jax.ops.segment_sum(msgs, half.rem_rows,
                               num_segments=half.num_rows)


def _bcsr_matmul_xla(half: _BCSRHalf, x: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA implementation (gather + einsum + segment-sum)."""
    xg = x.reshape(half.num_cols // BLOCK, BLOCK, -1)[half.block_cols]
    prod = jnp.einsum("kab,kbf->kaf", half.blocks[:half.nnzb], xg,
                      preferred_element_type=jnp.float32)
    out = jax.ops.segment_sum(
        prod, half.block_rows, num_segments=half.num_rows // BLOCK
    ).reshape(half.num_rows, -1)
    rem = _remainder_xla(half, x)
    return out if rem is None else out + rem


def _zero_cotangent(tree):
    """Zero cotangents matching ``tree``: float0 for integer leaves (JAX's
    required tangent dtype for ints), zeros for float leaves (DCE'd under
    jit since nothing consumes them)."""

    def leaf(a):
        if jnp.issubdtype(a.dtype, jnp.inexact):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, dtype=jax.dtypes.float0)

    return jax.tree_util.tree_map(leaf, tree)


# mat is a REGULAR pytree argument (zero cotangent), not nondiff_argnums:
# this keeps BCSRMatrix passable through jit/pjit as data — essential both
# for compile-payload size (blocks would otherwise be baked into the HLO as
# constants) and for trainers that thread operators as step arguments.
def _matmul_half(half: _BCSRHalf, x_pad: jnp.ndarray, use_pallas: bool):
    if not use_pallas:
        return _bcsr_matmul_xla(half, x_pad)
    return _bcsr_matmul_pallas(half, x_pad)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bcsr_spmm_padded(mat: BCSRMatrix, x_pad: jnp.ndarray, use_pallas: bool):
    return _matmul_half(mat.fwd, x_pad, use_pallas)


def _fwd(mat, x_pad, use_pallas):
    return _bcsr_spmm_padded(mat, x_pad, use_pallas), mat


def _bwd(use_pallas, mat, g):
    gx = _matmul_half(mat.bwd, g, use_pallas)
    return (_zero_cotangent(mat), gx)


_bcsr_spmm_padded.defvjp(_fwd, _bwd)


_warned_closed_over = False
# warning threshold for closed-over operator size (module-level so tests
# can exercise the real check on small operators).  Set high enough that
# only genuine compile-killers trip it — measured cliff starts around
# 50-100 MB of HLO constants (benchmarks/compile_bisect.py).
_CLOSED_OVER_WARN_BYTES = 64 * 1024 * 1024


def _warn_if_closed_over(mat: BCSRMatrix, x) -> None:
    """One-time warning for the operator-as-HLO-constant footgun.

    A concrete (non-traced) operator inside a jit trace gets baked into
    the HLO as constants — at N=20k/T=4 that is ~123 MB of literals, and
    the compile blows up from <1 s (operand style) to minutes of payload
    upload + constant folding on remotely-compiled platforms (measured,
    ``benchmarks/compile_bisect.py``); large payloads can reject outright
    (HTTP 413).  Pass the operator as a jit ARGUMENT instead.

    Caveats baked into the check:

    - operators the library builds itself inside a trace (``spmm``
      auto-dispatch under ``ensure_compile_time_eval``) are exempt — that
      path intentionally closes over a concrete Graph;
    - lifted transforms (``nn.scan`` inside ``Module.init``) trace their
      bodies even in an eager outer context, and the enclosing context is
      not detectable from here — so an eager ``init`` of a Seq model over
      a prebuilt operator triggers one (harmless) instance; the message
      says so rather than claiming certainty.
    """
    global _warned_closed_over
    if _warned_closed_over or getattr(mat, "_auto_built", False):
        return
    if isinstance(x, jax.core.Tracer) and not isinstance(
            mat.fwd.blocks, jax.core.Tracer):
        nbytes = sum(
            getattr(a, "nbytes", 0)
            for a in jax.tree_util.tree_leaves(mat)
        )
        if nbytes > _CLOSED_OVER_WARN_BYTES:
            _warned_closed_over = True
            warnings.warn(
                f"bcsr_spmm: a {nbytes / 1e6:.0f} MB BCSR operator is "
                "closed over inside a trace. If this trace is being "
                "jit-compiled, the operator is baked into the HLO as "
                "constants and compile time/payload scale with it "
                "(minutes on remotely-compiled platforms) — pass the "
                "operator as a jit argument instead. If this appears "
                "during an eager Module.init of a scan model and you "
                "pass the operator as an argument at train time, it is "
                "safe to ignore.",
                stacklevel=3,
            )


def bcsr_spmm(mat: BCSRMatrix, x: jnp.ndarray,
              use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Aggregate (..., N, F) features through the block-sparse operator."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    _warn_if_closed_over(mat, x)
    n = mat.num_nodes
    f = x.shape[-1]
    pad = mat.fwd.num_cols - n

    def one(x2d):
        if pad:
            x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        if mat.perm is not None:
            x2d = x2d[mat.perm]
        out = _bcsr_spmm_padded(mat, x2d, use_pallas)
        if mat.iperm is not None:
            out = out[mat.iperm]
        return out[:n, :f]

    if x.ndim == 2:
        return one(x)
    lead = x.shape[:-2]
    flat = x.reshape((-1,) + x.shape[-2:])
    out = jax.vmap(one)(flat)
    return out.reshape(lead + out.shape[-2:])


def _pad_half(half: _BCSRHalf, nnzb_max: int, s_max: int, sr_max: int,
              num_rem_max: int) -> _BCSRHalf:
    """Pad one half to the stacked-uniform shapes (see :func:`stack_bcsr`).

    All padding is *semantically inert*: extra tiles are zero, extra steps
    repeat the last row block (same-row steps skip the is_first zeroing
    and accumulate a zero product), extra remainder chunks carry val 0.
    """
    nb = half.num_rows // BLOCK
    hostc = getattr(half, "_host", None)

    def host(name):
        # prefer the cached host-side originals (device→host fetches are
        # glacial on tunneled platforms); fall back to a fetch
        if hostc is not None:
            return hostc[name]
        return np.asarray(getattr(half, name))

    blocks = np.asarray(host("blocks"))
    zero_tile = blocks[-1:]
    pad_tiles = np.zeros((nnzb_max - half.nnzb,) + blocks.shape[1:],
                         blocks.dtype)
    blocks = np.concatenate([blocks[:half.nnzb], pad_tiles, zero_tile])

    def pad1(name, target, fill):
        a = np.asarray(host(name)) if isinstance(name, str) else name
        if len(a) >= target:
            return a
        return np.concatenate(
            [a, np.full((target - len(a),) + a.shape[1:], fill, a.dtype)]
        )

    bidx = np.asarray(host("step_bidx")).copy()
    bidx[bidx == half.nnzb] = nnzb_max  # dummy slots -> new zero-tile index
    pack = half.pack
    rem_k = half.rem_vals.shape[1] if half.rem_vals.ndim == 2 else REM_K
    rem_rb = np.asarray(host("rem_step_rb"))
    rb_fill = rem_rb[-1] if len(rem_rb) else 0
    # leaves stay NUMPY here: stack_bcsr np.stacks them and uploads each
    # stacked leaf ONCE (per-snapshot jnp round trips would cost a
    # device↔host transfer pair per array on tunneled platforms)
    return _BCSRHalf(
        blocks=blocks,
        block_rows=pad1("block_rows", nnzb_max, 0),
        block_cols=pad1("block_cols", nnzb_max, 0),
        step_rows=pad1("step_rows", s_max, nb - 1),
        step_cols=pad1("step_cols", s_max * pack, 0),
        step_bidx=pad1(bidx, s_max * pack, nnzb_max),
        rem_cols=pad1("rem_cols", sr_max * rem_k, 0),
        rem_vals=pad1("rem_vals", sr_max, 0.0),
        rem_lrows=pad1("rem_lrows", sr_max, 0),
        rem_step_rb=pad1(rem_rb, sr_max, rb_fill),
        num_rows=half.num_rows,
        num_cols=half.num_cols,
        nnzb=nnzb_max,
        num_rem=num_rem_max,
        pack=pack,
    )


def stack_bcsr(mats) -> BCSRMatrix:
    """Stack per-snapshot BCSR operators along a leading time axis.

    The tiled path for **dynamic-edge sequences**: where a scan over
    snapshots with changing edge lists previously had only the segment
    path (per-step edge arrays are traced inside the scan, so no
    host-side tiling could happen — the old ``ops/spmm.py`` caveat),
    this host-builds every snapshot's operator, pads them to common
    shapes, and stacks each array leaf with a leading T axis.  Because
    ``BCSRMatrix`` is a registered pytree whose kernel consumes index
    arrays as *runtime* scalar-prefetch operands (only their shapes are
    compile-time), the result feeds ``jax.lax.scan`` directly::

        mats = [BCSRMatrix.from_graph(g_t, dtype=jnp.bfloat16, pack=4)
                for g_t in graphs]           # same N, same pack
        stacked = stack_bcsr(mats)
        def step(h, mat_t):                   # mat_t: one snapshot's op
            return f(bcsr_spmm(mat_t, h)), None
        h, _ = jax.lax.scan(step, h0, stacked)

    One compiled kernel serves every step.  Padding cost: tiles pad to
    the max tile count across snapshots (zero tiles multiply into rows
    they already touch), steps to the max step count (same-row dummy
    steps), remainder chunks to the max chunk count (zero-valued edges).
    For typical dynamic graphs (EnglandCovid / TwitterTennis pattern:
    edge sets drift, sizes stay same-order — reference
    ``dataset/encovid.py:28-40``) the waste is a few percent.

    All mats must share ``num_nodes`` and ``pack`` (build them with an
    explicit ``pack=`` value, or the same graph family so ``'auto'``
    agrees).
    """
    if not mats:
        raise ValueError("stack_bcsr needs at least one operator")
    n0, pk_f, pk_b = mats[0].num_nodes, mats[0].fwd.pack, mats[0].bwd.pack
    dt0 = mats[0].fwd.blocks.dtype
    for m in mats:
        if m.num_nodes != n0:
            raise ValueError("stack_bcsr: operators must share num_nodes")
        if (m.fwd.pack, m.bwd.pack) != (pk_f, pk_b):
            raise ValueError(
                "stack_bcsr: operators must share pack (pass an explicit "
                "pack= to BCSRMatrix.from_graph)"
            )
        # rem_vals.shape[-1] is well-defined even with zero chunks, so
        # check unconditionally (a guard on num_rem would let a bwd-only
        # or zero-chunk mismatch surface later as an opaque np.stack
        # shape error inside tree_map).
        for side in ("fwd", "bwd"):
            rk = getattr(m, side).rem_vals.shape[-1]
            rk_ref = getattr(mats[0], side).rem_vals.shape[-1]
            if rk != rk_ref:
                raise ValueError(
                    "stack_bcsr: operators must share rem_k (pass an "
                    "explicit rem_k= to BCSRMatrix.from_graph)"
                )
        if m.fwd.blocks.dtype != dt0:
            raise ValueError(
                "stack_bcsr: operators must share tile dtype (mixing "
                "would silently promote bf16 tiles to f32 and drop the "
                "bf16 kernel path) — pass the same dtype= to every "
                "BCSRMatrix.from_graph"
            )
    with_perm = [m.perm is not None for m in mats]
    if any(with_perm) and not all(with_perm):
        raise ValueError(
            "stack_bcsr: operators mix reordered and plain layouts — "
            "build every snapshot with the same reorder= setting"
        )
    halves = []
    for side in ("fwd", "bwd"):
        hs = [getattr(m, side) for m in mats]
        nnzb_max = max(h.nnzb for h in hs)
        s_max = max(h.step_rows.shape[0] for h in hs)
        sr_max = max(h.rem_step_rb.shape[0] for h in hs)
        rem_max = max(h.num_rem for h in hs)
        padded = [_pad_half(h, nnzb_max, s_max, sr_max, rem_max)
                  for h in hs]
        halves.append(jax.tree_util.tree_map(
            lambda *leaves: jnp.asarray(np.stack(leaves)), *padded
        ))
    perm = iperm = None
    if all(with_perm):
        perm = jnp.stack([m.perm for m in mats])
        iperm = jnp.stack([m.iperm for m in mats])
    return BCSRMatrix(fwd=halves[0], bwd=halves[1], num_nodes=n0,
                      perm=perm, iperm=iperm)


def hybrid_hbm_bytes(half: _BCSRHalf, f: int) -> dict:
    """HBM traffic model for one forward hybrid spmm (roofline accounting).

    The kernel is **bandwidth-bound**, not MXU-bound (at F=64 each bf16
    tile multiply moves 128·128·2 tile bytes for 2·128·128·F flops —
    arithmetic intensity ~2F/2 = F flops/byte on tile bytes alone, but the
    tiles are ~1-3% occupied so *useful* intensity is far lower), so the
    binding metric is achieved HBM bytes/s vs the chip's peak (v5e ≈ 819
    GB/s), not MFU.  Counted per phase:

    Tile kernel (grid = steps S, sorted by row block):
      - one (128, 128) tile fetch per step (dummy steps fetch the shared
        zero tile; counted — the pipeline re-fetches per step),
      - one (128, F) X column-block fetch per step,
      - one (128, F) f32 output write-back per row-block *run* (the output
        block is VMEM-resident across consecutive same-row steps).

    Remainder (XLA row-gather + scatter kernel, aliased base):
      - gather reads P = S_r·REM_K rows of X and writes the packed ``xg``
        (padding rows gather x[0] — real traffic, counted),
      - the kernel re-reads ``xg`` plus per-chunk vals/lrows scalars,
      - touched row blocks are read from ``base`` and written once; the
        aliasing leaves untouched blocks traffic-free.

    Returns ``{"tile", "remainder", "total"}`` bytes.  This is a *lower
    bound* on real traffic (no TLB/refetch effects), so achieved-bandwidth
    percentages derived from it are conservative.
    """
    s_tile = 2 if half.blocks.dtype == jnp.bfloat16 else 4
    s_x = s_tile
    # Mirror _f_layout: features wider than the 512-lane f_tile run the
    # grid (f_tiles, S) and each (128,128) tile is re-fetched once per
    # feature tile — the tile-fetch term scales with f_tiles.
    if f <= 128:
        f_eff, f_tiles = f, 1
    else:
        f_eff = _round_up(f, 128)
        ft = min(512, f_eff)
        if f_eff % ft:
            f_eff = _round_up(f_eff, ft)
        f_tiles = f_eff // ft
    slots = int(half.step_bidx.size)  # steps × pack tile/X fetch pairs
    nb_runs = int(np.unique(np.asarray(half.step_rows)).shape[0])
    tile = (
        slots * BLOCK * BLOCK * s_tile * f_tiles  # tile fetches (per f tile)
        + slots * BLOCK * f_eff * s_x           # X column blocks
        + nb_runs * BLOCK * f_eff * 4           # f32 output write-backs
    )
    rem = 0
    if half.num_rem:
        p = int(half.rem_cols.shape[0])
        s_r = int(half.rem_step_rb.shape[0])
        rem_k = int(half.rem_vals.shape[-1])  # the half's actual chunk width
        touched = int(np.unique(np.asarray(half.rem_step_rb)).shape[0])
        rem = (
            p * f_eff * s_x * 3                 # gather read + xg write + read
            + s_r * rem_k * 8                   # vals (f32) + lrows (i32)
            + touched * BLOCK * f_eff * 4 * 2   # base read + out write
        )
    return {"tile": tile, "remainder": rem, "total": tile + rem}


# Backwards-compat alias (pre-round-2 public name)
BCSRGraph = BCSRMatrix
