"""STGCN: spatio-temporal graph convolution blocks (Yu et al., IJCAI'18).

Capability parity with reference ``nn/attention/stgcn.py:8-160``
(``TemporalConv`` `:8-44`, ``STConv`` `:47-160`).

TPU-first: the reference runs its ChebConv in a double Python loop over
(batch, time) (``stgcn.py:149-153``); here the conv is one batched einsum
over the whole (B, T, N, C) tensor.  Internal layout is channel-last
(B, T, N, C) matching the reference's I/O layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import ChebConv


class TemporalConv(nn.Module):
    """Gated 1D-in-time conv: ``relu(P ⊙ σ(Q) + conv3(X))``.

    I/O: (B, T, N, C_in) -> (B, T - k + 1, N, C_out).
    """

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        # (B, T, N, C) -> (B, N, T, C): convolve over the T axis
        xt = jnp.swapaxes(x, 1, 2)
        conv = lambda name: nn.Conv(
            self.out_channels, kernel_size=(1, self.kernel_size),
            padding="VALID", name=name,
        )
        p = conv("conv_1")(xt)
        q = nn.sigmoid(conv("conv_2")(xt))
        h = nn.relu(p * q + conv("conv_3")(xt))
        return jnp.swapaxes(h, 1, 2)


class STConv(nn.Module):
    """ST-Conv block: TemporalConv → ChebConv → TemporalConv → BatchNorm.

    forward: (X (B, T, N, C), graph, lambda_max=None) -> (B, T', N, C_out)
    with T' = T − 2(kernel_size − 1).  BatchNorm statistics are per *node*
    (the reference's ``BatchNorm2d(num_nodes)``, ``stgcn.py:129,155-159``);
    pass ``train=True`` and make 'batch_stats' mutable during training.
    """

    num_nodes: int
    hidden_channels: int
    out_channels: int
    kernel_size: int
    K: int
    normalization: str = "sym"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, lambda_max=None, train: bool = False):
        from .._validate import check_node_axis, check_rank

        check_rank(x, "STConv", "(B, T, N, C)", 4)
        check_node_axis(x, graph, "STConv", "(B, T, N, C)", axis=2)
        t0 = TemporalConv(self.hidden_channels, self.kernel_size,
                          name="temporal_conv1")(x)
        gc = ChebConv(self.hidden_channels, self.K, self.normalization,
                      self.use_bias, name="graph_conv")
        t = nn.relu(gc(t0, graph, lambda_max))  # batched over (B, T')
        t = TemporalConv(self.out_channels, self.kernel_size,
                         name="temporal_conv2")(t)
        # per-node batch norm: feature axis = node axis (2)
        t = nn.BatchNorm(use_running_average=not train, axis=2,
                         name="batch_norm")(t)
        return t
