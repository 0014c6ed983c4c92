"""Chebyshev graph-convolutional LSTM (GConvLSTM) with peephole connections.

Capability parity with reference ``nn/recurrent/gconv_lstm.py:9-238``
(Seo et al., arXiv 1612.07659).  Gate math:

    I = σ(Cheb(X)W_xi + Cheb(H)W_hi + w_ci ⊙ C + b_i)
    F = σ(Cheb(X)W_xf + Cheb(H)W_hf + w_cf ⊙ C + b_f)
    C' = F⊙C + I⊙tanh(Cheb(X)W_xc + Cheb(H)W_hc + b_c)
    O = σ(Cheb(X)W_xo + Cheb(H)W_ho + w_co ⊙ C' + b_o)
    H' = O ⊙ tanh(C')

TPU-first: one Chebyshev basis per source (X, H) feeds all four gates as
fused matmuls.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import cheb_basis, glorot, zeros


class GConvLSTM(nn.Module):
    """forward: (X, graph, H=None, C=None, lambda_max=None) -> (H, C)."""

    out_channels: int
    K: int
    normalization: str = "sym"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, h: Optional[jnp.ndarray] = None,
                 c: Optional[jnp.ndarray] = None, lambda_max=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        C = self.out_channels
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        if c is None:
            c = jnp.zeros(x.shape[:-1] + (C,), x.dtype)

        bx = cheb_basis(graph, x, self.K, self.normalization, lambda_max)
        bh = cheb_basis(graph, h, self.K, self.normalization, lambda_max)

        def conv_pair(name):
            wx = self.param(f"w_x{name}", glorot, (bx.shape[-1], C))
            wh = self.param(f"w_h{name}", glorot, (bh.shape[-1], C))
            out = jnp.matmul(bx, wx, preferred_element_type=x.dtype)
            out = out + jnp.matmul(bh, wh, preferred_element_type=x.dtype)
            if self.use_bias:
                # the reference's two per-conv ChebConv biases collapse into
                # one (additive); the explicit per-gate b_* stays separate
                out = out + self.param(f"b_conv_{name}", zeros, (C,))
            return out

        def peephole(name):
            return self.param(f"w_c{name}", glorot, (1, C))

        def gate_bias(name):
            return self.param(f"b_{name}", zeros, (1, C))

        i = nn.sigmoid(conv_pair("i") + peephole("i") * c + gate_bias("i"))
        f = nn.sigmoid(conv_pair("f") + peephole("f") * c + gate_bias("f"))
        t = nn.tanh(conv_pair("c") + gate_bias("c"))
        c_new = f * c + i * t
        o = nn.sigmoid(conv_pair("o") + peephole("o") * c_new + gate_bias("o"))
        h_new = o * nn.tanh(c_new)
        return h_new, c_new
