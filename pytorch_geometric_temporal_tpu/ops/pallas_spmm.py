"""Pallas TPU kernels for large-graph aggregation (blocked-sparse SpMM).

Large graphs (N > dense_threshold) can't keep a dense (N, N) adjacency in
VMEM, and XLA's scatter lowering runs on the VPU.  The TPU-native answer is a
block-sparse (BCSR) layout: the adjacency is tiled into 128×128 blocks, only
nonzero blocks are stored, and the kernel streams X row-blocks from HBM with
scalar-prefetched block indices while the MXU multiplies dense blocks.

Host-side construction lives in :mod:`.bcsr`; this module holds the kernel
and the dispatch glue.  When a plain (COO) :class:`Graph` reaches the pallas
backend without a prebuilt BCSR structure we fall back to the segment path —
building BCSR requires host-side sorting of the edge list and cannot happen
on traced arrays.
"""

from __future__ import annotations



from .graph import Graph


def spmm_pallas(graph: Graph, x: jnp.ndarray, weights=None) -> jnp.ndarray:
    from .bcsr import BCSRGraph

    if isinstance(graph, BCSRGraph) and weights is None:
        from .bcsr import bcsr_spmm

        return bcsr_spmm(graph, x)
    from .spmm import spmm_segment

    return spmm_segment(graph, x, weights)
