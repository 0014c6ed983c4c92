"""Sparse matrix–matrix products (the framework's single hot primitive).

Every graph convolution in the model zoo reduces to repeated applications of
``spmm(graph, X)[r] = Σ_{edges s->r} w(s->r) · X[s]`` — the TPU-native
replacement for torch_geometric's ``MessagePassing.propagate`` scatter path
(reference ``nn/recurrent/dcrnn.py:86-106``, ``nn/attention/astgcn.py:169-190``
and every other conv call site).

Backends:

- ``dense``   : one MXU matmul against the cached dense adjacency.  On TPU
                this is the speed-of-light path for N up to a few thousand —
                the (N, N) operand tiles straight onto the 128×128 systolic
                array and XLA fuses surrounding elementwise work into it.
- ``segment`` : gather + ``jax.ops.segment_sum``.  Works everywhere, scales
                to arbitrary N, used as the correctness oracle and as the
                only option for *traced* large graphs (see below).
- ``pallas``  : hybrid block-sparse (BCSR) Pallas kernel (``bcsr.py``) for
                large graphs on TPU.  The BCSR structure is built host-side
                **automatically, with zero user opt-in**: when a large graph
                with concrete (non-traced) edge arrays reaches ``spmm``, the
                operator is tiled once and cached on the Graph instance.
                Models normalize their graphs at trace time on closed-over
                (constant) arrays, so the normalized operator is concrete
                and the auto path fires for every ordinary model call.

A large graph whose arrays are *traced* (passed through a jit argument or
sliced per-step out of a stacked dynamic-edge scan) cannot be tiled
on the fly — the structure build needs host-side sorting.  That case
falls back to the segment path with a loud one-time warning telling the
user how to get the kernel: close over the graph, pass a prenormalized
operator from :mod:`.operators`, or — for dynamic-edge sequences —
host-build per-snapshot operators and scan over
:func:`~.bcsr.stack_bcsr` (one compiled kernel, per-step operator data
as scan xs; the kernel consumes its index arrays as runtime
scalar-prefetch operands, so traced slices are fine).

``spmm`` accepts X of shape (..., N, F) with arbitrary leading batch dims.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import get_config
from .graph import Graph


def _resolve_backend(graph: Graph, backend: Optional[str]) -> str:
    cfg = get_config()
    b = backend or cfg.spmm_backend
    if b != "auto":
        return b
    if graph.num_nodes <= cfg.dense_threshold:
        return "dense"
    try:  # pallas only on TPU backends
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" else "segment"


def spmm_dense(graph: Graph, x: jnp.ndarray, weights=None) -> jnp.ndarray:
    g = graph if weights is None else graph.with_weights(weights)
    adj_t = g.to_adj_t(dtype=x.dtype)
    return jnp.matmul(adj_t, x, preferred_element_type=x.dtype)


def spmm_segment(graph: Graph, x: jnp.ndarray, weights=None) -> jnp.ndarray:
    w = graph.masked_weights() if weights is None else weights * graph.edge_mask()
    n = graph.num_nodes
    if x.ndim == 2:
        msgs = x[graph.senders] * w[:, None].astype(x.dtype)
        return jax.ops.segment_sum(msgs, graph.receivers, num_segments=n)
    # Leading batch dims: gather along -2, scatter-add along -2.
    msgs = jnp.take(x, graph.senders, axis=-2) * w[:, None].astype(x.dtype)
    out_shape = x.shape[:-2] + (n,) + x.shape[-1:]
    out = jnp.zeros(out_shape, x.dtype)
    return out.at[..., graph.receivers, :].add(msgs)


def _is_concrete(graph: Graph) -> bool:
    """True when the graph's arrays are real values (not jit tracers)."""
    return not any(
        isinstance(a, jax.core.Tracer)
        for a in (graph.senders, graph.receivers, graph.weights)
    )


_warned_traced_fallback = False


def _warn_traced_fallback(graph: Graph) -> None:
    global _warned_traced_fallback
    if _warned_traced_fallback:
        return
    _warned_traced_fallback = True
    warnings.warn(
        f"a large graph (N={graph.num_nodes}) reached spmm with *traced* "
        "edge arrays, so the block-sparse Pallas kernel cannot be built and "
        "the slower segment path is used. To hit the kernel either close "
        "over a concrete Graph in your jitted step (instead of passing it "
        "as a jit argument) or prebuild an operator with "
        "ops.operators.prenormalize_gcn/prenormalize_cheb/"
        "DiffusionOperators.from_graph and pass that to the model. For "
        "dynamic per-step edge lists inside a scan, host-build one "
        "BCSRMatrix per snapshot and scan over ops.stack_bcsr(mats).",
        stacklevel=3,
    )


def _auto_bcsr(graph: Graph, x_dtype):
    """Build (once, host-side) and cache the BCSR operator for this graph.

    Tiles are stored bf16 when the activations are bf16 (halves HBM traffic;
    the MXU multiplies bf16 natively with f32 accumulation), f32 otherwise.
    The cache lives on the Graph instance (outside the pytree), so repeated
    spmm calls inside one trace — and repeated traces over the same Graph
    object — reuse one build.

    Compile-payload tradeoff: the auto-built operator is a trace-time
    constant, so its tiles land in the HLO as literals.  Fine at the
    tens-of-MB scale this path serves; for ~100 MB+ operators (or stacked
    dynamic sequences) prebuild with ``BCSRMatrix.from_graph`` /
    ``DiffusionOperators.from_graph`` and pass the operator as a jit
    ARGUMENT — see ``benchmarks/compile_bisect.py`` for the measured
    compile-time cliff.
    """
    from ..config import get_config
    from .bcsr import BCSRMatrix

    tile_dtype = jnp.bfloat16 if x_dtype == jnp.bfloat16 else None
    reorder = "auto" if get_config().spmm_reorder == "auto" else None
    key = ("bcsr", str(tile_dtype), reorder)
    cache = getattr(graph, "_op_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(graph, "_op_cache", cache)
    mat = cache.get(key)
    if mat is None:
        # ensure_compile_time_eval: under a jit trace, array creation from
        # the host-built numpy tiles must stay concrete so the cached
        # operator never holds tracers.
        with jax.ensure_compile_time_eval():
            mat = BCSRMatrix.from_graph(graph, dtype=tile_dtype,
                                        reorder=reorder)
        # auto-built operators legitimately live inside the trace as
        # constants (the Graph itself was closed over); exempt them from
        # bcsr_spmm's closed-over-operator warning
        object.__setattr__(mat, "_auto_built", True)
        cache[key] = mat
    return mat


def spmm(
    graph: Graph,
    x: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Aggregate node features along edges: out[..., r, :] = Σ w · x[..., s, :].

    Args:
        graph: the (padded) graph, or a prebuilt
            :class:`~.bcsr.BCSRMatrix` operator.
        weights: optional per-edge coefficients overriding ``graph.weights``
            (e.g. attention-scaled norms).  Padding is masked internally.
        backend: 'dense' | 'segment' | 'pallas' | None (auto).
    """
    from .bcsr import BCSRMatrix, bcsr_spmm

    if hasattr(graph, "ops"):  # PreparedGraph: raw aggregation -> raw graph
        graph = graph.graph
    if isinstance(graph, BCSRMatrix):
        if weights is not None:
            raise ValueError(
                "weight override is not supported for prebuilt BCSRMatrix "
                "operators (weights are baked into the tiles)"
            )
        return bcsr_spmm(graph, x)
    b = _resolve_backend(graph, backend)
    if b == "dense":
        return spmm_dense(graph, x, weights)
    if b == "segment":
        return spmm_segment(graph, x, weights)
    if b == "pallas":
        # Per-call weight overrides are traced values (attention scores);
        # they cannot be baked into tiles. Bipartite (hetero) edges are
        # rectangular; the tiler assumes square. Both use the segment path.
        if weights is not None or graph.num_src is not None:
            return spmm_segment(graph, x, weights)
        if not _is_concrete(graph):
            _warn_traced_fallback(graph)
            return spmm_segment(graph, x, weights)
        return bcsr_spmm(_auto_bcsr(graph, x.dtype), x)
    raise ValueError(f"unknown spmm backend {b!r}")


def sddmm(
    graph: Graph, a: jnp.ndarray, b: jnp.ndarray, backend: Optional[str] = None
) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge scores  e = <a[s], b[r]>.

    Returns (E_pad,) with padded entries zeroed.  Used by attention models to
    compute edge scores without materializing N×N (when sparse); the dense
    path simply indexes the full score matrix.
    """
    if hasattr(graph, "ops"):  # PreparedGraph
        graph = graph.graph
    scores = jnp.einsum("ef,ef->e", a[graph.senders], b[graph.receivers])
    return scores * graph.edge_mask(scores.dtype)
