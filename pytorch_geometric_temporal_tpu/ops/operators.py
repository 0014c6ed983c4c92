"""Prenormalized graph operators — the large-graph model mode.

Models normally take a raw :class:`~.graph.Graph` and compute their
normalization (GCN/Chebyshev/diffusion) inside the jit trace; XLA hoists it
out of time scans, so for small graphs this costs one pass per step.  For
LARGE graphs two problems appear:

1. the in-trace norm rebuild is itself a segment-sum over millions of edges
   every step, and
2. the Pallas block-sparse path (:mod:`.bcsr`) needs *host-built* structure
   — it cannot be constructed from traced weights.

The fix is to normalize ONCE on the host (numpy mirrors of the jnp
transforms, bit-tested against them) and hand models a prenormalized
operator: either a plain :class:`Graph` (weights already normalized) or a
hybrid :class:`~.bcsr.BCSRMatrix` (MXU tiles + COO remainder).  Models
accept these wherever they accept a Graph:

- ``GCNConv(normalize=False)`` / ``gcn_conv_fixed_w(normalize=False)``
  with an operator from :func:`prenormalize_gcn`,
- ``ChebConv`` / ``cheb_basis`` with a :class:`Prenormalized` wrapper from
  :func:`prenormalize_cheb`,
- ``DCRNN``/``DCRNNSeq``/``diffusion_basis`` with
  :class:`DiffusionOperators` from :func:`DiffusionOperators.from_graph`.

The reference has no counterpart (PyG recomputes ``gcn_norm`` per call or
caches per-module, ``cached=True``); this is the TPU answer to the same
need, with the cache made an explicit, shardable pytree.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import numpy as np

from .graph import Graph


def _host_edges(graph: Graph):
    s, r, w = graph.host_edges()
    e = graph.num_edges
    return (
        np.asarray(s)[:e].astype(np.int64),
        np.asarray(r)[:e].astype(np.int64),
        np.asarray(w)[:e].astype(np.float64),
    )


def _safe_inv(x):
    out = np.zeros_like(x)
    nz = x != 0
    out[nz] = 1.0 / x[nz]
    return out


def _safe_inv_sqrt(x):
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = 1.0 / np.sqrt(x[pos])
    return out


def _graph_from(s, r, w, n) -> Graph:
    return Graph.from_edge_index(
        np.stack([s, r]), w.astype(np.float32), num_nodes=n
    )


def host_gcn_norm(graph: Graph, improved: bool = False,
                  add_self_loops: bool = True) -> Graph:
    """Numpy mirror of :func:`~.graph.gcn_norm` (tested equivalent)."""
    s, r, w = _host_edges(graph)
    n = graph.num_nodes
    if add_self_loops:
        loop = np.arange(n, dtype=s.dtype)
        fill = 2.0 if improved else 1.0
        s = np.concatenate([s, loop])
        r = np.concatenate([r, loop])
        w = np.concatenate([w, np.full(n, fill)])
    deg = np.bincount(r, weights=w, minlength=n)
    dis = _safe_inv_sqrt(deg)
    return _graph_from(s, r, dis[s] * w * dis[r], n)


def host_cheb_norm(graph: Graph, normalization: Optional[str] = "sym",
                   lambda_max: Optional[float] = None) -> Graph:
    """Numpy mirror of :func:`~.graph.cheb_norm`: L̂ = 2L/λ_max − I.

    Input self-loops are dropped first (PyG ``ChebConv.__norm__`` calls
    ``remove_self_loops`` before the Laplacian; exact-code parity is
    asserted in ``tests/test_golden_reference_code.py``)."""
    if lambda_max is None:
        lambda_max = 2.0
    s, r, w = _host_edges(graph)
    keep = s != r
    s, r, w = s[keep], r[keep], w[keep]
    n = graph.num_nodes
    deg = np.bincount(s, weights=w, minlength=n)
    if normalization == "sym":
        dis = _safe_inv_sqrt(deg)
        off = -dis[s] * w * dis[r]
        diag = np.ones(n)
    elif normalization == "rw":
        off = -_safe_inv(deg)[s] * w
        diag = np.ones(n)
    elif normalization is None:
        off = -w
        diag = deg
    else:
        raise ValueError(f"unknown normalization {normalization!r}")
    loop = np.arange(n, dtype=s.dtype)
    s2 = np.concatenate([s, loop, loop])
    r2 = np.concatenate([r, loop, loop])
    # scale by 2/λ_max, then add −I self-loops (matches cheb_norm order)
    w2 = np.concatenate([off * (2.0 / lambda_max),
                         diag * (2.0 / lambda_max),
                         np.full(n, -1.0)])
    return _graph_from(s2, r2, w2, n)


def host_diffusion_norms(graph: Graph):
    """Numpy mirror of :func:`~.graph.diffusion_norms` → (P_fwd, P_bwd)."""
    s, r, w = _host_edges(graph)
    n = graph.num_nodes
    deg_out = np.bincount(s, weights=w, minlength=n)
    deg_in = np.bincount(r, weights=w, minlength=n)
    p_fwd = _graph_from(r, s, w * _safe_inv(deg_out)[s], n)
    p_bwd = _graph_from(s, r, w * _safe_inv(deg_in)[r], n)
    return p_fwd, p_bwd


def _maybe_bcsr(g: Graph, bcsr: bool, block: int, dtype,
                min_block_edges: int, reorder=None):
    if not bcsr:
        return g
    from .bcsr import BCSRMatrix

    return BCSRMatrix.from_graph(g, block=block, dtype=dtype,
                                 min_block_edges=min_block_edges,
                                 reorder=reorder)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["op"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Prenormalized:
    """Marker wrapper: ``op`` is an already-normalized aggregation operator
    (Graph or BCSRMatrix).  ``cheb_basis``/``ChebConv`` skip the in-trace
    norm rebuild when handed one of these."""

    op: Any

    @property
    def num_nodes(self) -> int:
        return self.op.num_nodes


def prenormalize_gcn(graph: Graph, improved: bool = False,
                     add_self_loops: bool = True, bcsr: bool = False,
                     block: int = 128, dtype=None,
                     min_block_edges: int = 32):
    """Host-build the sym-normalized GCN operator.  Pass the result to
    ``GCNConv(normalize=False)`` / ``gcn_conv_fixed_w(..., normalize=False)``."""
    g = host_gcn_norm(graph, improved, add_self_loops)
    return _maybe_bcsr(g, bcsr, block, dtype, min_block_edges)


def stack_bcsr_gcn(graphs, improved: bool = False,
                   add_self_loops: bool = True, dtype=None,
                   min_block_edges="auto", expected_f: int = 64,
                   pack: int = 4):
    """Stacked prenormalized GCN operators for a dynamic-edge sequence.

    Host-builds ``host_gcn_norm`` + BCSR for every snapshot and stacks
    them (``ops.stack_bcsr``) so a ``lax.scan`` over the sequence runs
    the tiled Pallas kernel at every step — the large-graph path for
    dynamic sequences (EvolveGCN-style; see
    ``EvolveGCNOSeq(normalize=False)``).  ``pack`` is pinned (not
    ``'auto'``) because stacking requires all snapshots to agree.
    """
    from .bcsr import BCSRMatrix, stack_bcsr

    mats = [
        BCSRMatrix.from_graph(
            host_gcn_norm(g, improved, add_self_loops), dtype=dtype,
            min_block_edges=min_block_edges, expected_f=expected_f,
            pack=pack,
        )
        for g in graphs
    ]
    return stack_bcsr(mats)


def prenormalize_cheb(graph: Graph, normalization: Optional[str] = "sym",
                      lambda_max: Optional[float] = None, bcsr: bool = False,
                      block: int = 128, dtype=None,
                      min_block_edges: int = 32) -> Prenormalized:
    """Host-build the scaled Laplacian L̂.  Pass to ``ChebConv``/
    ``cheb_basis`` (and every Cheb-gated cell: GConvGRU/GConvLSTM/GCLSTM)."""
    g = host_cheb_norm(graph, normalization, lambda_max)
    return Prenormalized(_maybe_bcsr(g, bcsr, block, dtype, min_block_edges))


class PreparedGraph:
    """A Graph bundled with host-prebuilt normalized operators, as ONE pytree.

    Why this exists: the zero-opt-in large-graph path builds BCSR operators
    at trace time from *closed-over* concrete graphs, which bakes the tile
    values into the executable as constants.  That is fine locally, but
    compile payload grows with the graph (and remote-compile transports cap
    it).  ``PreparedGraph`` is the production form: build once on host,
    then pass it **as a jit argument** — the operators flow in as pytree
    leaves (runtime buffers, not HLO constants), and every norm function
    (:func:`~.graph.gcn_norm`, :func:`~.graph.cheb_norm`,
    :func:`~.graph.diffusion_norms`) transparently returns the prebuilt
    operator instead of recomputing.  Models need no changes — pass a
    PreparedGraph anywhere a Graph is accepted.

    ``ops`` keys reuse the norm functions' memo keys, e.g.
    ``("gcn_norm", False, True)``, ``("cheb_norm", "sym", 2.0)``,
    ``("diffusion_norms",)``.
    """

    def __init__(self, graph: Graph, ops: dict):
        self.graph = graph
        self.ops = dict(ops)

    # Graph-protocol delegation so models can treat it as a Graph.
    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes

    @property
    def num_edges(self) -> int:
        return self.graph.num_edges

    @property
    def num_src(self):
        return self.graph.num_src

    def __getattr__(self, name):
        # only called when not found on self: delegate to the raw graph
        if name in ("graph", "ops"):  # guard against init-order recursion
            raise AttributeError(name)
        return getattr(self.graph, name)

    def _tree_flatten(self):
        keys = tuple(sorted(self.ops.keys()))
        return (self.graph, tuple(self.ops[k] for k in keys)), keys

    @classmethod
    def _tree_unflatten(cls, keys, children):
        graph, ops = children
        return cls(graph, dict(zip(keys, ops)))


jax.tree_util.register_pytree_node(
    PreparedGraph,
    PreparedGraph._tree_flatten,
    lambda keys, ch: PreparedGraph._tree_unflatten(keys, ch),
)


def prepare_graph(
    graph: Graph,
    kinds=("gcn", "cheb", "diffusion"),
    bcsr: Optional[bool] = None,
    block: int = 128,
    dtype=None,
    min_block_edges: int = 32,
    gcn_improved: bool = False,
    gcn_add_self_loops: bool = True,
    cheb_normalization: Optional[str] = "sym",
    cheb_lambda_max: Optional[float] = None,
) -> PreparedGraph:
    """Host-build the normalized operators a model will need, once.

    ``kinds`` ⊆ {'gcn', 'cheb', 'diffusion'} (default: all three).
    ``bcsr=None`` auto-selects the block-sparse form for graphs above the
    dense threshold.  The result is a pytree — pass it through jit/pjit as
    an argument wherever the model takes its graph.
    """
    from ..config import get_config

    if bcsr is None:
        bcsr = graph.num_nodes > get_config().dense_threshold
    ops = {}
    if "gcn" in kinds:
        g = host_gcn_norm(graph, gcn_improved, gcn_add_self_loops)
        ops[("gcn_norm", gcn_improved, gcn_add_self_loops)] = _maybe_bcsr(
            g, bcsr, block, dtype, min_block_edges
        )
    if "cheb" in kinds:
        lam = 2.0 if cheb_lambda_max is None else float(cheb_lambda_max)
        g = host_cheb_norm(graph, cheb_normalization, lam)
        ops[("cheb_norm", cheb_normalization, lam)] = _maybe_bcsr(
            g, bcsr, block, dtype, min_block_edges
        )
    if "diffusion" in kinds:
        f, b = host_diffusion_norms(graph)
        ops[("diffusion_norms",)] = (
            _maybe_bcsr(f, bcsr, block, dtype, min_block_edges),
            _maybe_bcsr(b, bcsr, block, dtype, min_block_edges),
        )
    return PreparedGraph(graph, ops)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["p_fwd", "p_bwd"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class DiffusionOperators:
    """Prebuilt bidirectional diffusion operators for DCRNN-family models."""

    p_fwd: Any  # Graph or BCSRMatrix
    p_bwd: Any

    @property
    def num_nodes(self) -> int:
        return self.p_fwd.num_nodes

    @staticmethod
    def from_graph(graph: Graph, bcsr: bool = False, block: int = 128,
                   dtype=None, min_block_edges: int = 32, reorder=None):
        f, b = host_diffusion_norms(graph)
        return DiffusionOperators(
            p_fwd=_maybe_bcsr(f, bcsr, block, dtype, min_block_edges,
                              reorder),
            p_bwd=_maybe_bcsr(b, bcsr, block, dtype, min_block_edges,
                              reorder),
        )
