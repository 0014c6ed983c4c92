"""MSTGCN: multi-component spatial-temporal GCN (ASTGCN minus attention).

Capability parity with reference ``nn/attention/mstgcn.py:10-200``.  The
reference merges (T·B) into one ChebConv batch (`:82-94`); here ChebConv is
natively batch-polymorphic so the whole (B, T, N, F) tensor goes through in
one call.  λ_max of the un-normalized Laplacian is computed in-trace by
power iteration (replaces scipy ``LaplacianLambdaMax``, `:80-82`).
"""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph, lambda_max as power_lambda_max
from ..conv import ChebConv, glorot
from .astgcn import uniform_init


class MSTGCNBlock(nn.Module):
    """ChebConv → time conv + residual + LayerNorm; layout (B, N, F, T)."""

    in_channels: int
    K: int
    nb_chev_filter: int
    nb_time_filter: int
    time_strides: int

    @nn.compact
    def __call__(self, x, graph: Union[Graph, Sequence[Graph]]):
        conv = ChebConv(self.nb_chev_filter, self.K, None, name="cheb_conv")
        xt = jnp.moveaxis(x, -1, 1)  # (B, T, N, F)
        if isinstance(graph, (list, tuple)):
            outs = []
            for t, g in enumerate(graph):
                lam = power_lambda_max(g, None)
                outs.append(conv(xt[:, t], g, lam))
            x_tilde = nn.relu(jnp.stack(outs, axis=1))
        else:
            lam = power_lambda_max(graph, None)
            x_tilde = nn.relu(conv(xt, graph, lam))
        x_tilde = jnp.swapaxes(x_tilde, 1, 2)  # (B, N, T, C)
        x_tilde = nn.Conv(
            self.nb_time_filter, kernel_size=(1, 3),
            strides=(1, self.time_strides), padding=((0, 0), (1, 1)),
            name="time_conv",
        )(x_tilde)
        res = nn.Conv(
            self.nb_time_filter, kernel_size=(1, 1),
            strides=(1, self.time_strides), name="residual_conv",
        )(jnp.moveaxis(x, -1, 2))
        out = nn.LayerNorm(name="layer_norm")(nn.relu(res + x_tilde))
        return jnp.moveaxis(out, 2, -1)  # (B, N, C, T')


class MSTGCN(nn.Module):
    """forward: (X (B, N, F_in, T_in), graph | [graphs]) -> (B, N, T_out)."""

    nb_block: int
    in_channels: int
    K: int
    nb_chev_filter: int
    nb_time_filter: int
    time_strides: int
    num_for_predict: int
    len_input: int

    @nn.compact
    def __call__(self, x, graph):
        from .._validate import check_node_axis, check_rank

        check_rank(x, "MSTGCN", "(B, N, F_in, T_in)", 4)
        g0 = graph[0] if isinstance(graph, (list, tuple)) else graph
        check_node_axis(x, g0, "MSTGCN", "(B, N, F_in, T_in)", axis=1)
        if x.shape[-1] != self.len_input:
            raise ValueError(
                f"MSTGCN expects T_in == len_input ({self.len_input}); got "
                f"trailing axis {x.shape[-1]} (shape {tuple(x.shape)})."
            )
        blocks = [
            MSTGCNBlock(
                self.in_channels, self.K, self.nb_chev_filter,
                self.nb_time_filter, self.time_strides, name="block_0",
            )
        ] + [
            MSTGCNBlock(
                self.nb_time_filter, self.K, self.nb_chev_filter,
                self.nb_time_filter, 1, name=f"block_{i + 1}",
            )
            for i in range(self.nb_block - 1)
        ]
        for block in blocks:
            x = block(x, graph)
        t_out = self.len_input // self.time_strides
        w = self.param(
            "final_conv_w", glorot,
            (self.num_for_predict, t_out, self.nb_time_filter),
        )
        b = self.param("final_conv_b", uniform_init, (self.num_for_predict,))
        return jnp.einsum("bnft,ptf->bnp", x, w) + b
