"""Static graph representation and normalization transforms.

This is the TPU-native replacement for the reference's per-call PyG machinery
(``gcn_norm`` / ``get_laplacian`` / ``MessagePassing.propagate`` — see e.g.
reference ``nn/recurrent/dcrnn.py:59-77`` and ``nn/attention/astgcn.py:82-110``).

Design:

- A :class:`Graph` is an immutable pytree of padded, statically-shaped edge
  arrays (``senders``, ``receivers``, ``weights``) plus static metadata
  (``num_nodes``, ``num_edges``).  Static shapes mean a jitted model never
  recompiles across snapshots; dynamic-edge datasets pad every snapshot's edge
  list to one common maximum (see :func:`pad_graphs`).
- All normalization transforms (:func:`gcn_norm`, :func:`cheb_norm`,
  :func:`diffusion_norms`, ...) are pure jnp functions ``Graph -> Graph`` that
  are safe under ``jit``.  When a model is scanned over time with a static
  graph, XLA hoists the normalization out of the scan so it runs once per
  step, exactly like the reference's host-side caching — but with zero
  user-visible cache state (contrast ``BatchedDConv`` mutable caches,
  reference ``nn/recurrent/dcrnn.py:277-290,446-460``).

Conventions match PyG: ``edge_index[0]`` is the message *source* (row) and
``edge_index[1]`` the *target* (col); aggregation happens at the target.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["senders", "receivers", "weights"],
    meta_fields=["num_nodes", "num_edges", "num_src"],
)
@dataclasses.dataclass(frozen=True)
class Graph:
    """A padded, statically shaped sparse graph.

    Attributes:
        senders:   (E_pad,) int32 — source node of each edge.  Padded entries 0.
        receivers: (E_pad,) int32 — target node of each edge.  Padded entries 0.
        weights:   (E_pad,) float — edge weights.  Padded entries 0.0.
        num_nodes: static int — number of (receiver-side) nodes N.
        num_edges: static int — number of *real* edges (<= E_pad).
        num_src:   static int or None — sender-side node count for bipartite
                   (hetero) edges; None means square (num_nodes).
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    weights: jnp.ndarray
    num_nodes: int
    num_edges: int
    num_src: Optional[int] = None

    @property
    def src_count(self) -> int:
        return self.num_nodes if self.num_src is None else self.num_src

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_edge_index(
        edge_index,
        edge_weight=None,
        num_nodes: Optional[int] = None,
        pad_to: Optional[int] = None,
        dtype=jnp.float32,
        num_src: Optional[int] = None,
    ) -> "Graph":
        """Build from a PyG-style (2, E) edge index (host-side).

        ``num_src`` gives the sender-side node count for bipartite (hetero)
        edges; leave None for ordinary square graphs.
        """
        edge_index = np.asarray(edge_index)
        if edge_index.ndim != 2 or edge_index.shape[0] != 2:
            raise ValueError(f"edge_index must be (2, E), got {edge_index.shape}")
        E = edge_index.shape[1]
        if num_nodes is None:
            num_nodes = int(edge_index.max()) + 1 if E > 0 else 0
        if edge_weight is None:
            edge_weight = np.ones((E,), dtype=np.float32)
        else:
            edge_weight = np.asarray(edge_weight, dtype=np.float32).reshape(E)
        E_pad = pad_to if pad_to is not None else E
        if E_pad < E:
            raise ValueError(f"pad_to={E_pad} < num_edges={E}")
        senders = np.zeros((E_pad,), dtype=np.int32)
        receivers = np.zeros((E_pad,), dtype=np.int32)
        weights = np.zeros((E_pad,), dtype=np.float32)
        senders[:E] = edge_index[0]
        receivers[:E] = edge_index[1]
        weights[:E] = edge_weight
        g = Graph(
            senders=jnp.asarray(senders),
            receivers=jnp.asarray(receivers),
            weights=jnp.asarray(weights, dtype=dtype),
            num_nodes=int(num_nodes),
            num_edges=int(E),
            num_src=None if num_src is None else int(num_src),
        )
        # Host-side cache for preprocessing (BCSR/partition builders):
        # avoids device->host round trips, which can dominate on remote
        # devices.  Not part of the pytree; lost across jit boundaries.
        # Read-only: shared by every later builder (see host_edges()).
        for a in (senders, receivers, weights):
            a.flags.writeable = False
        object.__setattr__(g, "_host_edges", (senders, receivers, weights))
        return g

    def host_edges(self):
        """(senders, receivers, weights) as numpy, fetched at most once.

        The returned arrays are marked read-only: they are a shared cache
        on this (frozen) Graph, and callers mutating them would silently
        corrupt every later BCSR/partition build.  Copy before editing.
        """
        cached = getattr(self, "_host_edges", None)
        if cached is None:
            cached = (
                np.asarray(self.senders),
                np.asarray(self.receivers),
                np.asarray(self.weights),
            )
            for a in cached:
                if a.flags.writeable:  # np.asarray of device arrays may
                    a.flags.writeable = False  # already be read-only
            object.__setattr__(self, "_host_edges", cached)
        return cached

    # -- basic properties --------------------------------------------------

    @property
    def edge_pad(self) -> int:
        return self.senders.shape[-1]

    def edge_mask(self, dtype=jnp.float32) -> jnp.ndarray:
        """(E_pad,) mask of real edges; 1.0 for real, 0.0 for padding."""
        if self.num_edges == self.edge_pad:
            return jnp.ones((self.edge_pad,), dtype)
        return (jnp.arange(self.edge_pad) < self.num_edges).astype(dtype)

    def masked_weights(self) -> jnp.ndarray:
        return self.weights * self.edge_mask(self.weights.dtype)

    def with_weights(self, weights) -> "Graph":
        return dataclasses.replace(self, weights=weights)

    # -- structure transforms (all jit-safe) -------------------------------

    def reverse(self) -> "Graph":
        """Transposed graph (edges flipped). Weights carried along."""
        return dataclasses.replace(
            self,
            senders=self.receivers,
            receivers=self.senders,
            num_nodes=self.src_count,
            num_src=None if self.num_src is None else self.num_nodes,
        )

    def remove_self_loops(self) -> "Graph":
        """Zero the weight of any self-loop edge (jit-safe; shape preserved).

        Mirrors PyG ``remove_self_loops`` as used by ChebConvAttention
        (reference ``nn/attention/astgcn.py:93``): with weights zeroed the
        loops contribute to no aggregation, degree, or Laplacian entry.
        """
        keep = (self.senders != self.receivers).astype(self.weights.dtype)
        return self.with_weights(self.weights * keep)

    def add_self_loops(self, fill_value: float = 1.0) -> "Graph":
        """Append one self-loop per node with the given weight.

        Static shape change: E_pad -> E_pad + N.  ``num_edges`` is static, so
        the loop block is inserted at the static offset ``num_edges`` and the
        padding region stays trailing (prefix-mask invariant preserved).
        """
        n, e = self.num_nodes, self.num_edges
        loop = jnp.arange(n, dtype=self.senders.dtype)
        pad_s = self.senders[e:]
        senders = jnp.concatenate([self.senders[:e], loop, pad_s])
        receivers = jnp.concatenate([self.receivers[:e], loop, self.receivers[e:]])
        weights = jnp.concatenate(
            [
                self.weights[:e],
                jnp.full((n,), fill_value, self.weights.dtype),
                jnp.zeros_like(self.weights[e:]),
            ]
        )
        return Graph(senders, receivers, weights, n, e + n)

    # -- degrees -----------------------------------------------------------

    def out_degree(self, weighted: bool = True) -> jnp.ndarray:
        w = self.masked_weights() if weighted else self.edge_mask()
        return jax.ops.segment_sum(w, self.senders, self.src_count)

    def in_degree(self, weighted: bool = True) -> jnp.ndarray:
        w = self.masked_weights() if weighted else self.edge_mask()
        return jax.ops.segment_sum(w, self.receivers, self.num_nodes)

    # -- dense view --------------------------------------------------------

    def to_adj_t(self, dtype=None) -> jnp.ndarray:
        """Dense (N, N) matrix M with M[r, s] = w(s -> r), so spmm == M @ X.

        TPU-first: for graphs under the dense threshold this matrix is built
        once per jit trace and every aggregation is a single MXU matmul.
        """
        dtype = dtype or self.weights.dtype
        m = jnp.zeros((self.num_nodes, self.src_count), dtype=dtype)
        return m.at[self.receivers, self.senders].add(
            self.masked_weights().astype(dtype)
        )

    def to_adj(self, dtype=None) -> jnp.ndarray:
        """Dense (N, N) matrix A with A[s, r] = w(s -> r) (PyG to_dense_adj)."""
        return self.to_adj_t(dtype).T


def reorder_graph(graph: Graph):
    """Relabel nodes by the shortcut-filtered RCM bandwidth-reduction order.

    Returns ``(graph', perm, iperm)`` with ``perm[new_id] = old_id`` and
    ``iperm[old_id] = new_id`` (numpy int32).  This is the MODEL-LEVEL
    form of the reordering ``BCSRMatrix.from_graph(reorder=...)`` applies
    internally: permute the graph (and your feature/target arrays, once,
    at the boundary — ``x_new = x[perm]``, ``out = out_new[iperm]``...
    i.e. ``out[old] = out_new[iperm[old]]``) and run the ENTIRE model in
    permuted space, so recurrent models doing many aggregations per step
    pay the permutation once per forward instead of two gathers per spmm.

    Host-side (concrete graphs only); bipartite graphs are rejected (the
    relabeling assumes one square node set).  No-op permutation comes back
    when the graph has no edges.
    """
    from ..native import bandwidth_reduction_order

    if graph.num_src is not None:
        raise ValueError("reorder_graph needs a square (non-bipartite) graph")
    if not _concrete(graph):
        raise ValueError(
            "reorder_graph is host-side: pass a concrete Graph (outside "
            "jit, or under jax.ensure_compile_time_eval)"
        )
    e = graph.num_edges
    s = np.asarray(graph.senders)[:e]
    r = np.asarray(graph.receivers)[:e]
    n = graph.num_nodes
    perm = bandwidth_reduction_order(s, r, n)
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(n, dtype=np.int32)
    new_s = np.zeros(graph.senders.shape[0], np.int32)
    new_r = np.zeros(graph.receivers.shape[0], np.int32)
    new_s[:e] = iperm[s]
    new_r[:e] = iperm[r]
    g2 = dataclasses.replace(
        graph,
        senders=jnp.asarray(new_s),
        receivers=jnp.asarray(new_r),
    )
    return g2, perm, iperm


def pad_graphs(graphs, pad_to: Optional[int] = None):
    """Pad a list of Graphs to a common edge count (for dynamic-edge scans).

    Replaces the reference's per-snapshot ragged edge lists
    (``signal/dynamic_graph_temporal_signal.py``) with one static shape so a
    jitted ``lax.scan`` over snapshots never recompiles.
    """
    if pad_to is None:
        pad_to = max(g.num_edges for g in graphs)
    out = []
    for g in graphs:
        ep = g.edge_pad
        if ep == pad_to:
            out.append(g)
            continue
        if ep > pad_to:
            raise ValueError("pad_to smaller than an existing edge_pad")
        pad = pad_to - ep
        out.append(
            Graph(
                senders=jnp.concatenate(
                    [g.senders, jnp.zeros((pad,), g.senders.dtype)]
                ),
                receivers=jnp.concatenate(
                    [g.receivers, jnp.zeros((pad,), g.receivers.dtype)]
                ),
                weights=jnp.concatenate(
                    [g.masked_weights(), jnp.zeros((pad,), g.weights.dtype)]
                ),
                num_nodes=g.num_nodes,
                num_edges=g.num_edges,
            )
        )
    return out


def stack_graphs(graphs) -> Graph:
    """Stack equally-padded Graphs along a new leading (time) axis.

    The result is a Graph whose edge arrays are (T, E_pad); use with
    ``lax.scan`` by slicing per step.  ``num_edges`` becomes the max; per-step
    masking relies on zeroed padded weights from :func:`pad_graphs`.
    """
    graphs = pad_graphs(graphs)
    n = graphs[0].num_nodes
    if any(g.num_nodes != n for g in graphs):
        raise ValueError("all graphs must share num_nodes")
    return Graph(
        senders=jnp.stack([g.senders for g in graphs]),
        receivers=jnp.stack([g.receivers for g in graphs]),
        weights=jnp.stack([g.masked_weights() for g in graphs]),
        num_nodes=n,
        num_edges=max(g.num_edges for g in graphs),
    )


# ---------------------------------------------------------------------------
# Normalizations (jit-safe Graph -> Graph transforms)
# ---------------------------------------------------------------------------


def _prepared_lookup(graph, key):
    """(op_or_None, raw_graph): resolve a PreparedGraph's prebuilt operator.

    :class:`~.operators.PreparedGraph` bundles host-prebuilt normalized
    operators as pytree leaves so they cross jit boundaries as *arguments*
    (no HLO constants).  Norm functions return the prebuilt operator when
    its key matches; otherwise they fall through to recomputing from the
    raw graph.  Detection is duck-typed (an ``ops`` dict attribute) to
    avoid a circular import.
    """
    ops = getattr(graph, "ops", None)
    if ops is None:
        return None, graph
    return ops.get(key), graph.graph


def _concrete(graph: Graph) -> bool:
    return not any(
        isinstance(a, jax.core.Tracer)
        for a in (graph.senders, graph.receivers, graph.weights)
    )


def _with_cache(graph: Graph, key, build):
    """Instance-level memo for norm transforms on concrete graphs.

    Models re-derive their normalization at every conv call site (GConvGRU
    calls ``cheb_norm`` six times per step).  When the graph is a concrete
    closed-over constant the results are identical concrete Graphs, and —
    on the large-graph path — each would trigger its own host-side BCSR
    build in :func:`~.spmm.spmm`.  Memoizing the normalized Graph on the
    source instance collapses that to one build.

    Two tracing subtleties:

    - Under this JAX's tracing, ops on concrete *closure* arrays inside a
      jit trace still produce tracers, which (a) must never be cached
      (leak across traces) and (b) would make the normalized operator look
      traced to ``spmm``, silently skipping the BCSR kernel.  So the build
      runs under ``jax.ensure_compile_time_eval()``: on concrete inputs
      the result is concrete regardless of the ambient trace.
    - Traced graphs are never cached; as a final guard, any build whose
      output still contains tracers is returned un-cached.

    The cache is advisory: it lives outside the pytree and is lost across
    jit/pytree round-trips, which only costs a rebuild.
    """
    if not _concrete(graph):
        return build()
    cache = getattr(graph, "_op_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(graph, "_op_cache", cache)
    out = cache.get(key)
    if out is None:
        with jax.ensure_compile_time_eval():
            out = build()
        if any(
            isinstance(leaf, jax.core.Tracer)
            for leaf in jax.tree_util.tree_leaves(out)
        ):  # pragma: no cover - belt and braces against tracer leaks
            return out
        cache[key] = out
    return out


def _safe_inv(x):
    return jnp.where(x == 0, 0.0, 1.0 / jnp.where(x == 0, 1.0, x))


def _safe_inv_sqrt(x):
    return jnp.where(x <= 0, 0.0, jax.lax.rsqrt(jnp.where(x <= 0, 1.0, x)))


def gcn_norm(
    graph: Graph, improved: bool = False, add_self_loops: bool = True
) -> Graph:
    """Symmetric GCN normalization  D̃^{-1/2} Ã D̃^{-1/2}.

    Mirrors torch_geometric ``gcn_norm`` as used by the reference's
    ``GCNConv`` call sites (e.g. ``nn/recurrent/temporalgcn.py:36-75`` and
    ``nn/recurrent/evolvegcno.py:88-90``).  Zero degrees produce 0 (PyG masks
    inf to 0).
    """
    op, graph = _prepared_lookup(graph, ("gcn_norm", improved, add_self_loops))
    if op is not None:
        return op

    def build():
        fill = 2.0 if improved else 1.0
        g = graph.add_self_loops(fill) if add_self_loops else graph
        deg = g.in_degree(weighted=True)
        dis = _safe_inv_sqrt(deg)
        w = dis[g.senders] * g.masked_weights() * dis[g.receivers]
        return g.with_weights(w)

    return _with_cache(graph, ("gcn_norm", improved, add_self_loops), build)


def laplacian(graph: Graph, normalization: Optional[str] = "sym") -> Graph:
    """Graph Laplacian as an edge list (mirrors PyG ``get_laplacian``).

    - 'sym':  L = I - D^{-1/2} A D^{-1/2}
    - 'rw':   L = I - D^{-1} A
    - None:   L = D - A

    Degrees are scattered over the *source* node (PyG ``get_laplacian``
    scatters ``edge_weight`` over ``row``); for the undirected graphs these
    models target, source- and target-side degrees coincide.
    """
    w = graph.masked_weights()
    deg = graph.out_degree(weighted=True)
    if normalization == "sym":
        dis = _safe_inv_sqrt(deg)
        off = -dis[graph.senders] * w * dis[graph.receivers]
        diag = jnp.ones((graph.num_nodes,), w.dtype)
    elif normalization == "rw":
        di = _safe_inv(deg)
        off = -di[graph.senders] * w
        diag = jnp.ones((graph.num_nodes,), w.dtype)
    elif normalization is None:
        off = -w
        diag = deg
    else:
        raise ValueError(f"unknown normalization {normalization!r}")
    n, e = graph.num_nodes, graph.num_edges
    loop = jnp.arange(n, dtype=graph.senders.dtype)
    return Graph(
        senders=jnp.concatenate([graph.senders[:e], loop, graph.senders[e:]]),
        receivers=jnp.concatenate(
            [graph.receivers[:e], loop, graph.receivers[e:]]
        ),
        weights=jnp.concatenate([off[:e], diag, jnp.zeros_like(off[e:])]),
        num_nodes=n,
        num_edges=e + n,
    )


def cheb_norm(
    graph: Graph,
    normalization: Optional[str] = "sym",
    lambda_max: Optional[float] = None,
) -> Graph:
    """Scaled Laplacian  L̂ = 2 L / λ_max − I  used by Chebyshev convolution.

    Mirrors PyG ``ChebConv.__norm__`` semantics used throughout the reference
    (``nn/recurrent/gconv_gru.py``, ``gconv_lstm.py``, ``gc_lstm.py``,
    ``nn/attention/stgcn.py``): input self-loops removed before the
    Laplacian, λ_max defaults to 2.0 for 'sym', self-loop fill −1.0, inf→0
    masking.  ``lambda_max`` may be a traced scalar.  Exact-code parity is
    asserted in ``tests/test_golden_reference_code.py`` against a line-level
    transcription of the reference algorithm.
    """
    if lambda_max is None:
        lambda_max = 2.0
    if isinstance(lambda_max, (int, float)):
        op, graph = _prepared_lookup(
            graph, ("cheb_norm", normalization, float(lambda_max))
        )
        if op is not None:
            return op

    def build():
        lap = laplacian(graph.remove_self_loops(), normalization)
        w = lap.weights * (2.0 / lambda_max)
        w = jnp.where(jnp.isinf(w), 0.0, w)
        return lap.with_weights(w).add_self_loops(fill_value=-1.0)

    if isinstance(lambda_max, (int, float)):
        return _with_cache(
            graph, ("cheb_norm", normalization, float(lambda_max)), build
        )
    return build()  # traced lambda_max: not memoizable


def diffusion_norms(graph: Graph) -> Tuple[Graph, Graph]:
    """Forward/backward random-walk transition operators for diffusion conv.

    Returns (P_fwd, P_bwd) with  P_fwd = D_O^{-1} W  applied as
    ``spmm(P_fwd, X)[i] = (1/deg_out(i)) Σ_j W[i,j] X[j]``  and
    P_bwd = D_I^{-1} Wᵀ, per the DCRNN paper (arXiv 1707.01926).

    Deviation from the reference: the reference ``DConv``
    (``nn/recurrent/dcrnn.py:59-106``) drops edge weights from the messages
    and mis-aligns the reverse-pass norms with the re-sorted reverse edge
    list; we implement the paper's weighted operators with aligned norms.
    """
    op, graph = _prepared_lookup(graph, ("diffusion_norms",))
    if op is not None:
        return op

    def build():
        w = graph.masked_weights()
        deg_out = graph.out_degree(weighted=True)
        deg_in = graph.in_degree(weighted=True)
        # P_fwd[i, j] = W[i, j] / deg_out(i): message j->i over reversed
        # edges.  spmm aggregates at receiver; to compute sum_j W[i,j] x_j we
        # need edges (sender=j, receiver=i) with weight W[i, j] = weight of
        # edge i->j.
        p_fwd = graph.reverse().with_weights(
            w * _safe_inv(deg_out)[graph.senders]
        )
        # P_bwd[i, j] = W[j, i] / deg_in(i): edges (sender=j, receiver=i)
        # exist for original edges j->i, weight w(j->i)/deg_in(i).
        p_bwd = graph.with_weights(w * _safe_inv(deg_in)[graph.receivers])
        return p_fwd, p_bwd

    return _with_cache(graph, ("diffusion_norms",), build)


def lambda_max(graph: Graph, normalization: Optional[str] = "sym", iters: int = 64):
    """Largest Laplacian eigenvalue via power iteration (jit-safe).

    Replaces the reference's scipy ``LaplacianLambdaMax``
    (``nn/attention/astgcn.py:437-440``).
    """
    lap = laplacian(graph.remove_self_loops(), normalization)
    from .spmm import spmm  # local import to avoid cycle

    n = graph.num_nodes
    v0 = jnp.full((n, 1), 1.0 / np.sqrt(n), lap.weights.dtype)

    def body(_, v):
        v = spmm(lap, v)
        return v / (jnp.linalg.norm(v) + 1e-12)

    v = jax.lax.fori_loop(0, iters, body, v0)
    return jnp.vdot(v, spmm(lap, v)) / (jnp.vdot(v, v) + 1e-12)
