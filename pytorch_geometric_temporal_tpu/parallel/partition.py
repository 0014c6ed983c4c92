"""Node-partitioned graphs: spatial (graph) model parallelism.

This is the capability the reference *lacks* (its Dask-DDP replicates the
graph on every worker and shards only window indices — SURVEY §2.5/§2.6):
nodes are partitioned across the 'graph' mesh axis, each device owns a
contiguous node block and the edges pointing *into* it, and aggregation
runs under ``shard_map`` with the sender features exchanged over ICI.

Three exchange strategies, all numerically identical (tested against the
single-device segment-sum oracle):

- ``'gather'``: one ``all_gather`` of the full (N, F) feature matrix —
  optimal for reference-scale graphs (N ≤ ~11k) where the matrix is a few
  MB and a single fused all-gather saturates ICI.
- ``'scatter'``: sender-partitioned partial outputs reduced with
  ``psum_scatter`` — no feature gather at all.
- ``'halo'``: each device sends only the boundary rows each peer's edges
  actually reference, in one statically-shaped ``all_to_all``.  ICI volume
  drops from O(N·F) to O(P·H·F) per device, where H is the max halo size —
  for spatially-partitioned road graphs H ≪ N/P.  This is the exchange
  that scales to graphs whose feature matrices exceed VMEM.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..ops.graph import Graph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["senders", "receivers_local", "weights", "halo_send_idx",
                 "int_senders", "int_receivers", "int_weights"],
    meta_fields=["num_parts", "nodes_per_part", "num_nodes", "edges_per_part",
                 "partitioned_by", "halo_size", "interior_edges_per_part"],
)
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Host-built partition of a :class:`Graph` into P node blocks.

    Arrays (all (P, E_part)); meaning depends on ``partitioned_by``:

    - ``'receiver'`` (default): row p holds the edges INTO part p —
      ``senders`` are global node ids, ``receivers_local`` are indices
      within part p.  Used with the 'gather' exchange.
    - ``'sender'``: row p holds the edges OUT OF part p — ``senders`` are
      indices within part p, ``receivers_local`` are *global* node ids.
      Used with the 'scatter' (psum_scatter) exchange.
    - ``'halo'``: edges INTO part p are split into INTERIOR edges (sender
      owned by p: ``int_senders``/``int_receivers``/``int_weights``, local
      indices) and BOUNDARY edges (remote sender: ``senders`` index the
      received halo buffer as q·H + slot).  ``halo_send_idx[q, p]`` lists
      the local rows part q must ship to part p (q == p rows are unused —
      interior edges read local features directly).  The split is what
      enables compute/communication overlap: the interior aggregation has
      no data dependency on the ``all_to_all``, so XLA's latency-hiding
      scheduler runs it while the collective is in flight.

    Node block p owns global nodes [p·nodes_per_part, (p+1)·nodes_per_part).
    """

    senders: jnp.ndarray
    receivers_local: jnp.ndarray
    weights: jnp.ndarray
    num_parts: int
    nodes_per_part: int
    num_nodes: int  # original (unpadded) node count
    edges_per_part: int
    partitioned_by: str = "receiver"
    halo_send_idx: jnp.ndarray | None = None  # (P, P, H) local row ids
    halo_size: int = 0
    int_senders: jnp.ndarray | None = None    # (P, E_int) local sender idx
    int_receivers: jnp.ndarray | None = None  # (P, E_int) local receiver idx
    int_weights: jnp.ndarray | None = None    # (P, E_int)
    interior_edges_per_part: int = 0

    @property
    def padded_nodes(self) -> int:
        return self.num_parts * self.nodes_per_part

    @staticmethod
    def from_graph(graph: Graph, num_parts: int,
                   by: str = "receiver") -> "PartitionedGraph":
        if by not in ("receiver", "sender", "halo"):
            raise ValueError("by must be 'receiver', 'sender', or 'halo'")
        n = graph.num_nodes
        npp = _round_up(n, num_parts) // num_parts
        s_all, r_all, w_all = graph.host_edges()
        s = np.asarray(s_all)[: graph.num_edges]
        r = np.asarray(r_all)[: graph.num_edges]
        w = np.asarray(w_all)[: graph.num_edges]
        from ..native import partition_edges

        key = s if by == "sender" else r
        counts, order = partition_edges(key, npp, num_parts)
        e_max = max(1, int(counts.max()))
        S = np.zeros((num_parts, e_max), np.int32)
        R = np.zeros((num_parts, e_max), np.int32)
        W = np.zeros((num_parts, e_max), np.float32)

        if by == "halo":
            # Pass 1: per receiver-part p, split edges into INTERIOR (sender
            # owned by p) and BOUNDARY (remote sender); unique remote
            # senders split by owner part q (np.unique sorts, so owner
            # parts form contiguous runs).
            per_part = []
            h_max, off = 1, 0
            e_int_max = e_bnd_max = 1
            for p in range(num_parts):
                k = int(counts[p])
                idx = order[off : off + k]
                off += k
                owner = s[idx] // npp
                idx_int = idx[owner == p]
                idx_bnd = idx[owner != p]
                e_int_max = max(e_int_max, len(idx_int))
                e_bnd_max = max(e_bnd_max, len(idx_bnd))
                uniq, inv = np.unique(s[idx_bnd], return_inverse=True)
                uq = uniq // npp
                starts = np.searchsorted(uq, np.arange(num_parts + 1))
                if len(uniq):
                    h_max = max(h_max, int(np.diff(starts).max()))
                per_part.append((idx_int, idx_bnd, uniq, inv, uq, starts))
            # Pass 2: remap boundary senders to halo slots (q·H + pos),
            # record which local rows each part q ships to each p, and lay
            # interior edges out as purely local index triples.
            SB = np.zeros((num_parts, e_bnd_max), np.int32)
            RB = np.zeros((num_parts, e_bnd_max), np.int32)
            WB = np.zeros((num_parts, e_bnd_max), np.float32)
            SI = np.zeros((num_parts, e_int_max), np.int32)
            RI = np.zeros((num_parts, e_int_max), np.int32)
            WI = np.zeros((num_parts, e_int_max), np.float32)
            send_idx = np.zeros((num_parts, num_parts, h_max), np.int32)
            for p, (idx_int, idx_bnd, uniq, inv, uq, starts) in enumerate(
                per_part
            ):
                ki, kb = len(idx_int), len(idx_bnd)
                SI[p, :ki] = s[idx_int] - p * npp
                RI[p, :ki] = r[idx_int] - p * npp
                WI[p, :ki] = w[idx_int]
                pos = np.arange(len(uniq)) - starts[uq]
                remap = uq * h_max + pos
                SB[p, :kb] = remap[inv]
                RB[p, :kb] = r[idx_bnd] - p * npp
                WB[p, :kb] = w[idx_bnd]
                for q in range(num_parts):
                    seg = uniq[starts[q] : starts[q + 1]] - q * npp
                    send_idx[q, p, : len(seg)] = seg
            return PartitionedGraph(
                senders=jnp.asarray(SB),
                receivers_local=jnp.asarray(RB),
                weights=jnp.asarray(WB),
                num_parts=num_parts,
                nodes_per_part=npp,
                num_nodes=n,
                edges_per_part=e_bnd_max,
                partitioned_by="halo",
                halo_send_idx=jnp.asarray(send_idx),
                halo_size=h_max,
                int_senders=jnp.asarray(SI),
                int_receivers=jnp.asarray(RI),
                int_weights=jnp.asarray(WI),
                interior_edges_per_part=e_int_max,
            )

        off = 0
        for p in range(num_parts):
            k = int(counts[p])
            idx = order[off : off + k]
            off += k
            W[p, :k] = w[idx]
            if by == "receiver":
                S[p, :k] = s[idx]
                R[p, :k] = r[idx] - p * npp
            else:
                S[p, :k] = s[idx] - p * npp
                R[p, :k] = r[idx]
            # padded tail edges keep S=R=0 with weight 0: zero contribution
        return PartitionedGraph(
            senders=jnp.asarray(S),
            receivers_local=jnp.asarray(R),
            weights=jnp.asarray(W),
            num_parts=num_parts,
            nodes_per_part=npp,
            num_nodes=n,
            edges_per_part=e_max,
            partitioned_by=by,
        )

    def pad_features(self, x, node_axis: int = -2) -> jnp.ndarray:
        """Pad node features to P·nodes_per_part along ``node_axis``.

        Default -2 fits the (..., N, F) model layout; node-leading
        partitioned models pass ``node_axis=0`` for (N_pad, B, F).
        """
        axis = node_axis % x.ndim
        pad = self.padded_nodes - x.shape[axis]
        if pad == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    def shard_features(self, x, mesh: Mesh, axis_name: str = "graph",
                       node_axis: int = -2):
        """Pad + place node features sharded over the node axis."""
        xp = self.pad_features(x, node_axis)
        spec = [None] * xp.ndim
        spec[node_axis % xp.ndim] = axis_name
        return jax.device_put(xp, NamedSharding(mesh, PartitionSpec(*spec)))

    def ici_bytes_per_step(self, f: int, dtype_bytes: int = 4) -> int:
        """Per-device ICI EGRESS bytes for ONE forward aggregation.

        The analytic basis for multi-chip scaling claims where real
        multi-chip hardware is unavailable (VERDICT r3 #8): predicted
        comm volume + measured single-chip kernel time bound the expected
        efficiency.  Ring-algorithm egress per device:

        - ``'receiver'``/gather:   all_gather of (N_pad, F) —
          (P−1)·npp·F·b (each device's shard traverses P−1 hops).
        - ``'sender'``/scatter:    psum_scatter of (N_pad, F) partials —
          (P−1)·npp·F·b (reduce-scatter moves one shard per hop).
        - ``'halo'``:              all_to_all of (P, H, F) —
          (P−1)·H·F·b (only boundary rows travel; H = max halo rows any
          peer needs, ``halo_size``).

        Backward doubles each (all_gather ↔ reduce_scatter are mutual
        transposes; all_to_all is self-transposed).
        """
        p = self.num_parts
        if self.partitioned_by == "halo":
            rows = self.halo_size
        else:
            rows = self.nodes_per_part
        return (p - 1) * rows * f * dtype_bytes


def spmm_partitioned(
    pgraph: PartitionedGraph,
    x: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "graph",
    exchange: str = "gather",
) -> jnp.ndarray:
    """Sharded aggregation: out[r] = Σ_{s->r} w · x[s], node-sharded.

    ``x``: (N_pad, F) sharded over ``axis_name``; returns the same sharding.

    Two exchange strategies (same O(N·F) ICI volume, different shapes):

    - ``'gather'``  (receiver-partitioned edges): one ``all_gather`` brings
      remote sender features in, then a local gather + segment-sum emits the
      owned receiver block.  Backward = reduce-scatter (automatic).
    - ``'scatter'`` (sender-partitioned edges, build with
      ``from_graph(..., by='sender')``): each device forms messages from its
      LOCAL sender features into a full-length partial output and a
      ``psum_scatter`` reduces+distributes receiver blocks.  No feature
      gather at all — the shape that generalizes to sparse halo exchange.
    - ``'halo'`` (build with ``from_graph(..., by='halo')``): each device
      gathers the boundary rows each peer's edges reference into a
      (P, H, F) block and one ``all_to_all`` swaps them; edges index the
      received buffer directly.  ICI volume O(P·H·F) ≪ O(N·F) when the
      partition cut is small.  Replaces the reference's graph-replicated
      Dask-DDP (SURVEY §2.5) with true spatial model parallelism.
    """
    from jax import shard_map

    npp = pgraph.nodes_per_part

    # Arbitrary trailing feature dims: the aggregation is linear over
    # features, so (N_pad, B, C, ...) flattens to (N_pad, B·C·...) — a
    # free reshape (the sharded node axis is untouched).  This is what
    # lets node-leading partitioned MODELS (x laid out (N_pad, B, C))
    # reuse the rank-2 exchange kernels.
    trailing = x.shape[1:]
    if x.ndim != 2:
        x = x.reshape(x.shape[0], -1)
        out = spmm_partitioned(pgraph, x, mesh, axis_name, exchange)
        return out.reshape((out.shape[0],) + trailing)

    spec_e = PartitionSpec(axis_name, None)
    spec_x = PartitionSpec(axis_name, None)

    if exchange == "gather":
        if pgraph.partitioned_by != "receiver":
            raise ValueError("'gather' exchange needs receiver-partitioned edges")

        def local(es, er, ew, x_local):
            # es/er/ew: (1, E); x_local: (npp, F)
            x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
            msgs = x_full[es[0]] * ew[0][:, None].astype(x_local.dtype)
            return jax.ops.segment_sum(msgs, er[0], num_segments=npp)

    elif exchange == "scatter":
        if pgraph.partitioned_by != "sender":
            raise ValueError("'scatter' exchange needs sender-partitioned edges")
        n_pad = pgraph.padded_nodes

        def local(es_local, er_global, ew, x_local):
            # edges grouped by *sender* part: senders are local indices,
            # receivers are global
            msgs = x_local[es_local[0]] * ew[0][:, None].astype(x_local.dtype)
            partial = jax.ops.segment_sum(
                msgs, er_global[0], num_segments=n_pad
            )
            # reduce partials across devices and keep the owned block
            return jax.lax.psum_scatter(
                partial, axis_name, scatter_dimension=0, tiled=True
            )

    elif exchange == "halo":
        if pgraph.partitioned_by != "halo":
            raise ValueError("'halo' exchange needs halo-partitioned edges "
                             "(build with from_graph(..., by='halo'))")
        def local_halo(send_idx, es_b, er_b, ew_b, es_i, er_i, ew_i, x_local):
            # send_idx: (1, P, H) local rows to ship to each peer.  The
            # all_to_all is issued FIRST; the interior aggregation below
            # has no data dependency on it, so XLA's latency-hiding
            # scheduler overlaps the local segment-sum with the collective
            # (async start/done pair on TPU).
            blocks = x_local[send_idx[0]]  # (P, H, F)
            recv = jax.lax.all_to_all(
                blocks, axis_name, split_axis=0, concat_axis=0, tiled=True
            )  # (P, H, F): block q = rows part q shipped to me
            # interior: senders owned locally — independent of recv
            msgs_i = x_local[es_i[0]] * ew_i[0][:, None].astype(x_local.dtype)
            out = jax.ops.segment_sum(msgs_i, er_i[0], num_segments=npp)
            # boundary: consumes the received halo buffer
            halo = recv.reshape(-1, x_local.shape[-1])  # (P·H, F)
            msgs_b = halo[es_b[0]] * ew_b[0][:, None].astype(x_local.dtype)
            return out + jax.ops.segment_sum(msgs_b, er_b[0],
                                             num_segments=npp)

        return shard_map(
            local_halo,
            mesh=mesh,
            in_specs=(PartitionSpec(axis_name, None, None),
                      spec_e, spec_e, spec_e, spec_e, spec_e, spec_e,
                      spec_x),
            out_specs=spec_x,
        )(pgraph.halo_send_idx, pgraph.senders, pgraph.receivers_local,
          pgraph.weights, pgraph.int_senders, pgraph.int_receivers,
          pgraph.int_weights, x)

    else:
        raise ValueError(f"unknown exchange {exchange!r}")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_e, spec_e, spec_e, spec_x),
        out_specs=spec_x,
    )(pgraph.senders, pgraph.receivers_local, pgraph.weights, x)
