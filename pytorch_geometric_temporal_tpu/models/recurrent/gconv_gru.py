"""Chebyshev graph-convolutional GRU (GConvGRU).

Capability parity with reference ``nn/recurrent/gconv_gru.py:5-170``
(Seo et al., arXiv 1612.07659), re-designed TPU-first:

- the six per-gate ChebConvs become three stacked-basis matmuls: the
  Chebyshev basis is computed once per input (X, H, H·R) and each gate is a
  single ``(N, K·F) @ (K·F, C)`` MXU matmul (identical math — the basis is
  linear, so per-gate weights are just blocks of the fused weight).
- batch-polymorphic: accepts (..., N, F), so there is no separate "batched"
  variant class.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import cheb_basis, glorot, zeros


class GConvGRU(nn.Module):
    """forward: (X, graph, H=None, lambda_max=None) -> H."""

    out_channels: int
    K: int
    normalization: str = "sym"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, h: Optional[jnp.ndarray] = None,
                 lambda_max=None):
        C = self.out_channels
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (C,), x.dtype)

        bx = cheb_basis(graph, x, self.K, self.normalization, lambda_max)
        bh = cheb_basis(graph, h, self.K, self.normalization, lambda_max)

        def gate(name, bin_, prev=None):
            w = self.param(f"w_{name}", glorot, (bin_.shape[-1], C))
            out = jnp.matmul(bin_, w, preferred_element_type=x.dtype)
            if prev is not None:
                out = out + prev
            return out

        def bias(name):
            return self.param(f"b_{name}", zeros, (C,)) if self.use_bias else 0.0

        z = nn.sigmoid(gate("xz", bx) + gate("hz", bh) + bias("z"))
        r = nn.sigmoid(gate("xr", bx) + gate("hr", bh) + bias("r"))
        bhr = cheb_basis(graph, h * r, self.K, self.normalization, lambda_max)
        h_tilde = nn.tanh(gate("xh", bx) + gate("hh", bhr) + bias("h"))
        return z * h + (1.0 - z) * h_tilde
