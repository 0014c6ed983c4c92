"""Block-sparse (BCSR) matrices + Pallas TPU SpMM kernel.

For graphs past the dense threshold (e.g. all-California PeMS, 11160 nodes —
reference ``examples/indexBatching/DCRNN/pems_main.py:142``) a dense (N, N)
adjacency means ~500 MB of HBM traffic per aggregation.  Real road networks
are locally clustered, so tiling the aggregation matrix ``M[r, s] = w(s→r)``
into 128×128 blocks and storing only nonzero blocks cuts that traffic by the
block sparsity while every FLOP still lands on the MXU.

- :class:`BCSRMatrix` is built host-side from a :class:`~.graph.Graph`
  (sorting the edge list by (row-block, col-block)).
- :func:`bcsr_spmm` runs a Pallas kernel with scalar-prefetched block
  indices: grid over nonzero blocks (sorted by row-block), the output block
  stays resident in VMEM across consecutive same-row steps (revisiting
  accumulation), and X column-blocks stream in via the BlockSpec pipeline.
- Gradients: custom VJP using the transposed BCSR structure (built at
  construction), so ``d/dX spmm(M, X) = spmm(Mᵀ, ḡ)`` is another kernel
  call.  Block *values* are treated as constants (normalized adjacencies are
  not trained in this model family).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph

BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "block_rows", "block_cols",
                 "rem_rows", "rem_cols", "rem_vals"],
    meta_fields=["num_rows", "num_cols", "nnzb", "num_rem"],
)
@dataclasses.dataclass(frozen=True)
class _BCSRHalf:
    """One direction of the hybrid block-sparse operator.

    Blocks with at least ``min_block_edges`` edges are stored dense (the
    MXU path); edges landing in sparser blocks spill to a COO *remainder*
    handled by gather+segment-sum.  Without the split, a handful of
    long-range edges each allocate a whole 128×128 tile and block HBM
    traffic dwarfs the useful bytes (0.6% in-tile occupancy measured on a
    clustered 50k/2M graph with 1% random edges)."""

    blocks: jnp.ndarray      # (nnzb, BLOCK, BLOCK) dense nonzero tiles
    block_rows: jnp.ndarray  # (nnzb,) int32, sorted ascending
    block_cols: jnp.ndarray  # (nnzb,) int32
    rem_rows: jnp.ndarray    # (num_rem,) int32 remainder COO
    rem_cols: jnp.ndarray    # (num_rem,) int32
    rem_vals: jnp.ndarray    # (num_rem,) f32
    num_rows: int            # padded row count (multiple of BLOCK)
    num_cols: int
    nnzb: int
    num_rem: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd"],
    meta_fields=["num_nodes"],
)
@dataclasses.dataclass(frozen=True)
class BCSRMatrix:
    """Forward + transposed block-sparse aggregation operator."""

    fwd: _BCSRHalf
    bwd: _BCSRHalf
    num_nodes: int  # original (unpadded)

    @staticmethod
    def from_graph(graph: Graph, block: int = BLOCK, dtype=None,
                   min_block_edges=32, expected_f: int = 64) -> "BCSRMatrix":
        """Host-side construction from a Graph (aggregation M[r,s] = w).

        ``dtype=jnp.bfloat16`` stores tiles in bf16 — halves HBM traffic for
        the kernel (accumulation stays f32); default keeps f32 tiles.

        ``min_block_edges``: blocks with fewer edges spill their edges to
        the COO remainder path instead of materializing a dense tile.
        ``'auto'`` picks the threshold from the graph's measured block-
        occupancy histogram via :func:`tune_min_block_edges` (uses
        ``expected_f``, the typical feature width, in its byte model); an
        int fixes it (the break-even is ~10 edges/tile at F=64 bf16; 32
        leaves margin); 0 disables the split.
        """
        e = graph.num_edges
        s_all, r_all, w_all = graph.host_edges()
        s = np.asarray(s_all)[:e]
        r = np.asarray(r_all)[:e]
        w = np.asarray(w_all)[:e].copy()
        n = graph.num_nodes
        if min_block_edges == "auto":
            min_block_edges = tune_min_block_edges(
                r, s, n, block, dtype, expected_f
            )
        return BCSRMatrix(
            fwd=_build_half(r, s, w, n, block, dtype, min_block_edges),
            bwd=_build_half(s, r, w, n, block, dtype, min_block_edges),
            num_nodes=n,
        )

    @property
    def density(self) -> float:
        nb = self.fwd.num_rows // BLOCK
        return self.fwd.nnzb / max(nb * (self.fwd.num_cols // BLOCK), 1)


def tune_min_block_edges(rows, cols, n, block=BLOCK, dtype=None,
                         expected_f: int = 64,
                         scatter_penalty: float = 13.0,
                         max_tile_bytes: int = 1 << 30) -> int:
    """Pick the tile/COO spill threshold from the measured occupancy histogram.

    Cost model (HBM bytes; the kernel is bandwidth-bound):

    - a kept tile costs ``block² · s_tile``  (tile read) plus
      ``block · F · s_x`` (the X tile it multiplies),
    - a spilled edge costs ``2 · F · s_x · scatter_penalty`` — gather +
      scatter-accumulate bytes inflated by the VPU scatter's measured
      inefficiency (calibrated on v5e: the segment path runs ~13× below
      the bandwidth roofline at F=64, matching the observed ~10-edge
      break-even).

    For every candidate threshold θ (the distinct occupancy counts), total
    cost = kept_tiles(θ)·tile_bytes + spilled_edges(θ)·edge_bytes, subject
    to a storage guard: kept tiles may not exceed ``max_tile_bytes`` of HBM
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
        return 0
    cnt = np.bincount(block_of_edge, minlength=nnzb)
    s_tile = 2 if dtype == jnp.bfloat16 else 4
    s_x = s_tile  # the kernel streams X at the tile dtype
    tile_bytes = block * block * s_tile + block * expected_f * s_x
    edge_bytes = 2 * expected_f * 4 * scatter_penalty
    order = np.sort(cnt)
    # candidate thresholds: each distinct count (+inf == spill everything)
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
        cost = kept_tiles * tile_bytes + (e - kept_edges) * edge_bytes
        if cost < best_cost:
            best_cost, best_theta = cost, int(theta)
    return best_theta


def bcsr_structure_counts(cols, rows, block, grid_cols):
    """Structure pass only (no tile fill): delegates to the native helper."""
    from ..native import bcsr_structure

    return bcsr_structure(cols, rows, block, grid_cols)


def _build_half(rows, cols, vals, n, block, dtype=None,
                min_block_edges: int = 0) -> _BCSRHalf:
    from ..native import bcsr_fill, bcsr_structure

    n_pad = _round_up(max(n, 1), block)
    grid_cols = n_pad // block
    # sender=cols (within-block col index), receiver=rows (row index)
    nnzb_real, block_of_edge, block_rows, block_cols = bcsr_structure(
        cols, rows, block, grid_cols
    )

    rem_rows = np.zeros((1,), np.int32)
    rem_cols = np.zeros((1,), np.int32)
    rem_vals = np.zeros((1,), np.float32)
    num_rem = 0
    if min_block_edges > 1 and nnzb_real > 0:
        cnt = np.bincount(block_of_edge, minlength=nnzb_real)
        edge_is_sparse = (cnt < min_block_edges)[block_of_edge]
        num_rem = int(edge_is_sparse.sum())
        if num_rem:
            rem_rows = rows[edge_is_sparse].astype(np.int32)
            rem_cols = cols[edge_is_sparse].astype(np.int32)
            rem_vals = vals[edge_is_sparse].astype(np.float32)
            # invariant: remainder sorted by row — lets the scatter use
            # indices_are_sorted (1.5x on the segment_sum, measured v5e)
            order = np.argsort(rem_rows, kind="stable")
            rem_rows = rem_rows[order]
            rem_cols = rem_cols[order]
            rem_vals = rem_vals[order]
            keep = ~edge_is_sparse
            rows, cols, vals = rows[keep], cols[keep], vals[keep]
            nnzb_real, block_of_edge, block_rows, block_cols = (
                bcsr_structure(cols, rows, block, grid_cols)
            )

    nnzb = max(nnzb_real, 1)
    if nnzb_real == 0:
        # all edges spilled (or empty graph): keep one all-zero placeholder
        # tile at (0, 0) so blocks/block_rows/block_cols shapes stay
        # consistent (contributes nothing).
        block_rows = np.zeros((1,), np.int32)
        block_cols = np.zeros((1,), np.int32)
    blocks = bcsr_fill(cols, rows, vals, block_of_edge, block, nnzb)
    if dtype is not None:
        blocks = blocks.astype(dtype)
    if nnzb_real == 0:
        block_rows = np.zeros((1,), np.int32)
        block_cols = np.zeros((1,), np.int32)
    return _BCSRHalf(
        blocks=jnp.asarray(blocks),
        block_rows=jnp.asarray(block_rows),
        block_cols=jnp.asarray(block_cols),
        rem_rows=jnp.asarray(rem_rows),
        rem_cols=jnp.asarray(rem_cols),
        rem_vals=jnp.asarray(rem_vals),
        num_rows=n_pad,
        num_cols=n_pad,
        nnzb=nnzb,
        num_rem=num_rem,
    )


def _bcsr_matmul_pallas(half: _BCSRHalf, x: jnp.ndarray,
                        interpret: bool = False,
                        f_tile: int = 512) -> jnp.ndarray:
    """out (num_rows, F) = Σ_blocks block @ x[col_block]; x: (num_cols, F).

    Grid: (F_tiles, nnzb) — F outermost so that, per F tile, the nonzero
    blocks sweep in row-sorted order and the output tile stays VMEM-resident
    across consecutive same-row steps (revisiting accumulation).  Wide
    feature matrices are tiled at ``f_tile`` columns to bound VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f = x.shape[-1]
    f_pad = _round_up(f, 128)
    f_tile = min(_round_up(f_tile, 128), f_pad)
    if f_pad % f_tile:
        f_pad = _round_up(f_pad, f_tile)
    if f_pad != f:
        x = jnp.pad(x, ((0, 0), (0, f_pad - f)))
    f_tiles = f_pad // f_tile
    if half.blocks.dtype == jnp.bfloat16:
        # bf16 tiles ⇒ stream bf16 feature tiles too (halves x traffic);
        # the MXU multiplies bf16×bf16 natively, accumulation stays f32.
        x = x.astype(jnp.bfloat16)

    def kernel(rows_ref, cols_ref, blocks_ref, x_ref, o_ref):
        k = pl.program_id(1)
        prev = rows_ref[jnp.maximum(k - 1, 0)]
        is_first = jnp.logical_or(k == 0, rows_ref[k] != prev)

        @pl.when(is_first)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(
            blocks_ref[0], x_ref[:],
            preferred_element_type=jnp.float32,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(f_tiles, half.nnzb),
        in_specs=[
            pl.BlockSpec((1, BLOCK, BLOCK),
                         lambda j, k, rows, cols: (k, 0, 0)),
            pl.BlockSpec((BLOCK, f_tile),
                         lambda j, k, rows, cols: (cols[k], j)),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, f_tile), lambda j, k, rows, cols: (rows[k], j)
        ),
    )
    # F tiles are independent ('parallel'); the nnzb sweep must stay
    # in order ('arbitrary') for the revisiting accumulation.  The hint is
    # worth ~4% on v5e (measured round 2).
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    except TypeError:  # pragma: no cover - older pallas versions
        compiler_params = None
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((half.num_rows, f_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(half.block_rows, half.block_cols, half.blocks, x)
    # Row blocks no tile ever visits are UNDEFINED memory (the kernel only
    # zero-inits on first visit) — common under the hybrid split where most
    # rows live in the COO remainder.  Select-zero them (where, not multiply:
    # the garbage can be NaN).
    nb = half.num_rows // BLOCK
    covered = jnp.zeros((nb,), jnp.bool_).at[half.block_rows].set(True)
    out = jnp.where(jnp.repeat(covered, BLOCK)[:, None], out, 0.0)
    return out[:, :f]


def _remainder(half: _BCSRHalf, x: jnp.ndarray) -> Optional[jnp.ndarray]:
    """COO remainder: edges from sub-threshold blocks (None when empty).

    ``rem_rows`` is sorted at build time (``_build_half``) and the scatter
    passes ``indices_are_sorted``: measured END-TO-END on v5e (round 2,
    99k remainder edges fused with the tile kernel, F=64) the sorted
    lowering runs the whole hybrid spmm at 1503us vs 2399us without the
    flag.  (Isolated micro-benchmarks of the scatter alone point the other
    way — fusion context matters; trust the end-to-end number.)  When
    tiles are bf16 the gather streams bf16 too (halves the random-read
    bytes); the scatter accumulates f32 either way.
    """
    if half.num_rem == 0:
        return None
    if half.blocks.dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    msgs = x[half.rem_cols].astype(jnp.float32) * half.rem_vals[:, None]
    return jax.ops.segment_sum(msgs, half.rem_rows,
                               num_segments=half.num_rows,
                               indices_are_sorted=True)


def _bcsr_matmul_xla(half: _BCSRHalf, x: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA implementation (gather + einsum + segment-sum)."""
    xg = x.reshape(half.num_cols // BLOCK, BLOCK, -1)[half.block_cols]
    prod = jnp.einsum("kab,kbf->kaf", half.blocks, xg,
                      preferred_element_type=jnp.float32)
    out = jax.ops.segment_sum(
        prod, half.block_rows, num_segments=half.num_rows // BLOCK
    ).reshape(half.num_rows, -1)
    rem = _remainder(half, x)
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
    out = _bcsr_matmul_pallas(half, x_pad)
    rem = _remainder(half, x_pad)
    return out if rem is None else out + rem


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bcsr_spmm_padded(mat: BCSRMatrix, x_pad: jnp.ndarray, use_pallas: bool):
    return _matmul_half(mat.fwd, x_pad, use_pallas)


def _fwd(mat, x_pad, use_pallas):
    return _bcsr_spmm_padded(mat, x_pad, use_pallas), mat


def _bwd(use_pallas, mat, g):
    gx = _matmul_half(mat.bwd, g, use_pallas)
    return (_zero_cotangent(mat), gx)


_bcsr_spmm_padded.defvjp(_fwd, _bwd)


def bcsr_spmm(mat: BCSRMatrix, x: jnp.ndarray,
              use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Aggregate (..., N, F) features through the block-sparse operator."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = mat.num_nodes
    pad = mat.fwd.num_cols - n

    def one(x2d):
        if pad:
            x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        out = _bcsr_spmm_padded(mat, x2d, use_pallas)
        return out[:n]

    if x.ndim == 2:
        return one(x)
    lead = x.shape[:-2]
    flat = x.reshape((-1,) + x.shape[-2:])
    out = jax.vmap(one)(flat)
    return out.reshape(lead + out.shape[-2:])


# Backwards-compat alias (pre-round-2 public name)
BCSRGraph = BCSRMatrix
