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
                to arbitrary N, used for very large graphs and as the
                correctness oracle.
- ``pallas``  : blocked ELL kernel (``pallas_spmm.py``) for large graphs on
                real TPU cores.

``spmm`` accepts X of shape (..., N, F) with arbitrary leading batch dims.
"""

from __future__ import annotations

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


def spmm(
    graph: Graph,
    x: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Aggregate node features along edges: out[..., r, :] = Σ w · x[..., s, :].

    Args:
        graph: the (padded) graph.
        weights: optional per-edge coefficients overriding ``graph.weights``
            (e.g. attention-scaled norms).  Padding is masked internally.
        backend: 'dense' | 'segment' | 'pallas' | None (auto).
    """
    from .bcsr import BCSRMatrix

    if isinstance(graph, BCSRMatrix):
        from .bcsr import bcsr_spmm

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
        from .pallas_spmm import spmm_pallas

        return spmm_pallas(graph, x, weights)
    raise ValueError(f"unknown spmm backend {b!r}")


def sddmm(
    graph: Graph, a: jnp.ndarray, b: jnp.ndarray, backend: Optional[str] = None
) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge scores  e = <a[s], b[r]>.

    Returns (E_pad,) with padded entries zeroed.  Used by attention models to
    compute edge scores without materializing N×N (when sparse); the dense
    path simply indexes the full score matrix.
    """
    scores = jnp.einsum("ef,ef->e", a[graph.senders], b[graph.receivers])
    return scores * graph.edge_mask(scores.dtype)
