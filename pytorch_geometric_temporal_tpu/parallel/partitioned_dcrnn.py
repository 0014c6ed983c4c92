"""Node-partitioned DCRNN: the BASELINE north-star training capability.

The reference's only distributed story replicates the graph on every
worker and shards window indices (Dask-DDP — SURVEY §2.5).  This module is
the capability that replaces it at the MODEL level: the graph's nodes are
partitioned across the 'graph' mesh axis, every diffusion hop runs through
:func:`~.partition.spmm_partitioned` with the halo ``all_to_all`` exchange
(interior edges overlap the collective), and the GRU gating is purely
local — so a full DCRNN training step scales over ICI with O(P·H·F)
per-step communication instead of full replication.

Layout is node-leading: features are (N_pad, B, F) sharded over axis 0
(``PartitionSpec('graph', None, None)``), so every elementwise/gate op is
embarrassingly node-parallel under ``jit`` with sharding propagation.

Parameter tree compatibility: :class:`DCRNNPartitioned` uses the exact
parameter names/shapes of :class:`~..models.recurrent.dcrnn.DCRNN`, so
params trained single-device load directly into the partitioned model and
vice versa (tested equivalent).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..models.conv import glorot, zeros
from ..ops.graph import Graph
from ..ops.operators import host_diffusion_norms
from .partition import PartitionedGraph, spmm_partitioned


class PartitionedDiffusionOperators:
    """Host-prebuilt bidirectional diffusion operators, halo-partitioned.

    Build once from the raw graph; the normalized P_fwd / P_bwd edge sets
    are each partitioned by receiver with the interior/boundary halo split.
    """

    def __init__(self, p_fwd: PartitionedGraph, p_bwd: PartitionedGraph):
        self.p_fwd = p_fwd
        self.p_bwd = p_bwd

    @staticmethod
    def from_graph(graph: Graph, num_parts: int
                   ) -> "PartitionedDiffusionOperators":
        f, b = host_diffusion_norms(graph)
        return PartitionedDiffusionOperators(
            PartitionedGraph.from_graph(f, num_parts, by="halo"),
            PartitionedGraph.from_graph(b, num_parts, by="halo"),
        )

    @property
    def padded_nodes(self) -> int:
        return self.p_fwd.padded_nodes

    def pad_features(self, x):
        """Pad NODE-LEADING features (N, ...) to (N_pad, ...)."""
        return self.p_fwd.pad_features(x, node_axis=0)

    def shard_features(self, x, mesh, axis_name: str = "graph"):
        """Pad + shard NODE-LEADING features (N, ...) over the node axis."""
        return self.p_fwd.shard_features(x, mesh, axis_name, node_axis=0)


def partitioned_diffusion_basis(pops: PartitionedDiffusionOperators,
                                x: jnp.ndarray, K: int, mesh,
                                axis_name: str = "graph") -> jnp.ndarray:
    """Stacked bidirectional diffusion basis over the partitioned operators.

    Same math and layout as :func:`~..models.recurrent.dcrnn.diffusion_basis`
    (``[T_0^f .. T_{K-1}^f | T_0^b .. T_{K-1}^b]`` on the feature axis), but
    node-leading: x is (N_pad, ..., F) sharded over the node axis, and every
    hop is one halo-exchange aggregation.
    """
    out = []
    for p in (pops.p_fwd, pops.p_bwd):
        tx = [x]
        if K > 1:
            tx.append(spmm_partitioned(p, x, mesh, axis_name, "halo"))
        for _ in range(2, K):
            tx.append(
                2.0 * spmm_partitioned(p, tx[-1], mesh, axis_name, "halo")
                - tx[-2]
            )
        out.extend(tx)
    return jnp.concatenate(out, axis=-1)


class DCRNNPartitioned(nn.Module):
    """Diffusion-convolutional GRU cell over a node-partitioned graph.

    forward: (X (N_pad, B, F), pops, mesh, H=None) -> H (N_pad, B, C),
    all node-sharded.  Parameters are interchangeable with
    :class:`~..models.recurrent.dcrnn.DCRNN`.
    """

    out_channels: int
    K: int
    use_bias: bool = True
    axis_name: str = "graph"

    @nn.compact
    def __call__(self, x, pops: PartitionedDiffusionOperators, mesh,
                 h: Optional[jnp.ndarray] = None):
        C = self.out_channels
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        xh = jnp.concatenate([x, h], axis=-1)
        b_xh = partitioned_diffusion_basis(pops, xh, self.K, mesh,
                                           self.axis_name)
        w_zr = self.param("w_zr", glorot, (b_xh.shape[-1], 2 * C))
        zr = jnp.matmul(b_xh, w_zr, preferred_element_type=x.dtype)
        if self.use_bias:
            zr = zr + self.param("b_zr", zeros, (2 * C,))
        z, r = jnp.split(nn.sigmoid(zr), 2, axis=-1)
        xhr = jnp.concatenate([x, h * r], axis=-1)
        b_xhr = partitioned_diffusion_basis(pops, xhr, self.K, mesh,
                                            self.axis_name)
        w_h = self.param("w_h", glorot, (b_xhr.shape[-1], C))
        ht = jnp.matmul(b_xhr, w_h, preferred_element_type=x.dtype)
        if self.use_bias:
            ht = ht + self.param("b_h", zeros, (C,))
        return z * h + (1.0 - z) * nn.tanh(ht)


class DCRNNPartitionedSeq(nn.Module):
    """Sequence-to-sequence partitioned DCRNN over (T, N_pad, B, F) inputs.

    Node-leading counterpart of :class:`~..models.recurrent.dcrnn.DCRNNSeq`
    (time leads so the scan slices contiguous steps); returns all hidden
    states (T, N_pad, B, C), node-sharded throughout.
    """

    out_channels: int
    K: int
    use_bias: bool = True
    axis_name: str = "graph"
    unroll: int = 1

    @nn.compact
    def __call__(self, x, pops: PartitionedDiffusionOperators, mesh,
                 h0: Optional[jnp.ndarray] = None):
        if x.ndim != 4:
            raise ValueError(
                f"DCRNNPartitionedSeq expects input (T, N_pad, B, F); got "
                f"shape {tuple(x.shape)}"
            )
        T, N, B, F = x.shape
        if h0 is None:
            h0 = jnp.zeros((N, B, self.out_channels), x.dtype)
        cell = DCRNNPartitioned(self.out_channels, self.K, self.use_bias,
                                self.axis_name, name="cell")
        scan = nn.scan(
            lambda c, carry, xt: (c(xt, pops, mesh, carry),) * 2,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            unroll=self.unroll,
        )
        _, hs = scan(cell, h0, x)
        return hs
