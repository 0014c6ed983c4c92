"""ASTGCN: attention-based spatial-temporal GCN (Guo et al., AAAI'19).

Capability parity with reference ``nn/attention/astgcn.py:16-610``:
``ChebConvAttention`` (`:16-190`), ``SpatialAttention`` (`:203-262`),
``TemporalAttention`` (`:265-328`), ``ASTGCNBlock`` (`:331-480`),
``ASTGCN`` (`:483-610`).

TPU-first notes:

- ChebConvAttention runs in dense form: the scaled Laplacian becomes an
  (N, N) matrix once per trace and every hop is a batched einsum over the
  full (B, T, N, F) tensor — the reference loops Python over T
  (``astgcn.py:442-471``).
- Reference quirks preserved: hop-1 messages are attention-scaled, hops ≥ 2
  use the raw Chebyshev norm (`:169-178`); T_0 is X scaled by the attention
  diagonal (`:161-167`); self-loops removed before the Laplacian (`:93`).
- λ_max for non-'sym' normalization is computed in-trace by power iteration
  (replaces scipy ``LaplacianLambdaMax``, `:437-440`).
- Dynamic per-step edge lists are supported by passing a list of Graphs
  (one per input step, pre-padded).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.graph import Graph, cheb_norm, lambda_max as power_lambda_max
from ..conv import glorot

uniform_init = nn.initializers.uniform(scale=1.0)


def _lhat_dense(graph: Graph, normalization: Optional[str]) -> jnp.ndarray:
    """Dense scaled Laplacian L̂[i, j] for ChebConvAttention."""
    if graph.num_nodes > 8192:
        raise ValueError(
            f"ChebConvAttention/ASTGCN materializes the (N, N) scaled "
            f"Laplacian AND a per-batch (B, N, N) spatial attention — "
            f"O(N²) memory; N={graph.num_nodes} is past any sensible "
            "dense size. The spatial attention itself is dense by design "
            "(reference datasets have N <= 325); partition the graph or "
            "use a non-attention model (MSTGCN dense blocks have the same "
            "limit) for large N."
        )
    g = graph.remove_self_loops()
    if normalization == "sym":
        lam = None
    else:
        lam = power_lambda_max(g, normalization)
    lhat = cheb_norm(g, normalization, lam)
    return lhat.to_adj()  # [senders=row, receivers=col] -> L[row, col]


class ChebConvAttention(nn.Module):
    """Chebyshev conv with spatial-attention-scaled first hop.

    forward: (x (B, T, N, F) or (B, N, F), graph | [graphs], S (B, N, N))
    -> same leading shape with F -> out_channels.
    """

    out_channels: int
    K: int
    normalization: Optional[str] = "sym"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph: Union[Graph, Sequence[Graph]], spatial_attention):
        squeeze_t = x.ndim == 3
        if squeeze_t:
            x = x[:, None]  # (B, 1, N, F)
        B, T, N, F = x.shape
        s = spatial_attention  # (B, N, N)

        w = self.param("weight", glorot, (self.K, F, self.out_channels))

        s_diag = jnp.einsum("bii->bi", s)  # (B, N)
        tax0 = x * s_diag[:, None, :, None]

        if isinstance(graph, (list, tuple)):
            l_stack = jnp.stack(
                [_lhat_dense(g, self.normalization) for g in graph]
            )  # (T, N, N)
            hop1 = jnp.einsum("tij,bij,btjf->btif", l_stack, s, tax0)
            hop = lambda v: jnp.einsum("tij,btjf->btif", l_stack, v)
        else:
            l_dense = _lhat_dense(graph, self.normalization)  # (N, N)
            hop1 = jnp.einsum("ij,bij,btjf->btif", l_dense, s, tax0)
            hop = lambda v: jnp.einsum("ij,btjf->btif", l_dense, v)

        out = jnp.einsum("btnf,fo->btno", tax0, w[0])
        if self.K > 1:
            tax1 = hop1
            out = out + jnp.einsum("btnf,fo->btno", tax1, w[1])
            for k in range(2, self.K):
                tax2 = 2.0 * hop(tax1) - tax0
                out = out + jnp.einsum("btnf,fo->btno", tax2, w[k])
                tax0, tax1 = tax1, tax2
        if self.use_bias:
            out = out + self.param("bias", uniform_init, (self.out_channels,))
        return out[:, 0] if squeeze_t else out


class SpatialAttention(nn.Module):
    """S = softmax_rows(Vs · σ(LHS·RHS + bs)) over (B, N, N)."""

    in_channels: int
    num_of_vertices: int
    num_of_timesteps: int

    @nn.compact
    def __call__(self, x):
        # x: (B, N, F, T)
        F_, T = self.in_channels, self.num_of_timesteps
        N = self.num_of_vertices
        w1 = self.param("W1", uniform_init, (T,))
        w2 = self.param("W2", glorot, (F_, T))
        w3 = self.param("W3", uniform_init, (F_,))
        bs = self.param("bs", glorot, (1, N, N))
        vs = self.param("Vs", glorot, (N, N))
        lhs = jnp.einsum("bnft,t->bnf", x, w1)
        lhs = jnp.einsum("bnf,ft->bnt", lhs, w2)
        rhs = jnp.einsum("f,bnft->btn", w3, x)
        s = jnp.einsum("ij,bjn->bin", vs, nn.sigmoid(
            jnp.einsum("bnt,btm->bnm", lhs, rhs) + bs))
        return jax.nn.softmax(s, axis=1)


class TemporalAttention(nn.Module):
    """E = softmax(Ve · σ(LHS·RHS + be)) over (B, T, T)."""

    in_channels: int
    num_of_vertices: int
    num_of_timesteps: int

    @nn.compact
    def __call__(self, x):
        # x: (B, N, F, T)
        F_, T = self.in_channels, self.num_of_timesteps
        N = self.num_of_vertices
        u1 = self.param("U1", uniform_init, (N,))
        u2 = self.param("U2", glorot, (F_, N))
        u3 = self.param("U3", uniform_init, (F_,))
        be = self.param("be", glorot, (1, T, T))
        ve = self.param("Ve", glorot, (T, T))
        lhs = jnp.einsum("bnft,n->btf", x, u1)
        lhs = jnp.einsum("btf,fn->btn", lhs, u2)
        rhs = jnp.einsum("f,bnft->bnt", u3, x)
        e = jnp.einsum("ij,bjt->bit", ve, nn.sigmoid(
            jnp.einsum("btn,bns->bts", lhs, rhs) + be))
        return jax.nn.softmax(e, axis=1)


class ASTGCNBlock(nn.Module):
    """temporal attn → spatial attn → attention ChebConv → time conv +
    residual + LayerNorm.  I/O layout (B, N, F, T) as in the reference."""

    in_channels: int
    K: int
    nb_chev_filter: int
    nb_time_filter: int
    time_strides: int
    num_of_vertices: int
    num_of_timesteps: int
    normalization: Optional[str] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph):
        B, N, F_, T = x.shape
        e = TemporalAttention(self.in_channels, N, T, name="temporal_attention")(x)
        x_tilde = jnp.einsum("bnft,bts->bnfs", x, e)
        s = SpatialAttention(self.in_channels, N, T, name="spatial_attention")(x_tilde)
        conv = ChebConvAttention(
            self.nb_chev_filter, self.K, self.normalization, self.use_bias,
            name="chebconv_attention",
        )
        xt = jnp.moveaxis(x, -1, 1)  # (B, T, N, F)
        x_hat = nn.relu(conv(xt, graph, s))  # (B, T, N, C)
        # time conv over T: layout (B, N, T, C)
        x_hat = jnp.swapaxes(x_hat, 1, 2)
        x_hat = nn.Conv(
            self.nb_time_filter, kernel_size=(1, 3),
            strides=(1, self.time_strides), padding=((0, 0), (1, 1)),
            name="time_convolution",
        )(x_hat)
        res = nn.Conv(
            self.nb_time_filter, kernel_size=(1, 1),
            strides=(1, self.time_strides), name="residual_convolution",
        )(jnp.moveaxis(x, -1, 2))  # (B, N, T, F) -> conv -> (B, N, T', C)
        out = nn.LayerNorm(name="layer_norm")(nn.relu(res + x_hat))
        return jnp.moveaxis(out, 2, -1)  # (B, N, C, T')


class ASTGCN(nn.Module):
    """forward: (X (B, N, F_in, T_in), graph | [graphs]) -> (B, N, T_out)."""

    nb_block: int
    in_channels: int
    K: int
    nb_chev_filter: int
    nb_time_filter: int
    time_strides: int
    num_for_predict: int
    len_input: int
    num_of_vertices: int
    normalization: Optional[str] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph):
        from .._validate import check_node_axis, check_rank

        check_rank(x, "ASTGCN", "(B, N, F_in, T_in)", 4)
        g0 = graph[0] if isinstance(graph, (list, tuple)) else graph
        check_node_axis(x, g0, "ASTGCN", "(B, N, F_in, T_in)", axis=1)
        if x.shape[-1] != self.len_input:
            raise ValueError(
                f"ASTGCN expects T_in == len_input ({self.len_input}); got "
                f"trailing axis {x.shape[-1]} (shape {tuple(x.shape)})."
            )
        blocks = [
            ASTGCNBlock(
                self.in_channels, self.K, self.nb_chev_filter,
                self.nb_time_filter, self.time_strides, self.num_of_vertices,
                self.len_input, self.normalization, self.use_bias,
                name="block_0",
            )
        ] + [
            ASTGCNBlock(
                self.nb_time_filter, self.K, self.nb_chev_filter,
                self.nb_time_filter, 1, self.num_of_vertices,
                self.len_input // self.time_strides, self.normalization,
                self.use_bias, name=f"block_{i + 1}",
            )
            for i in range(self.nb_block - 1)
        ]
        for block in blocks:
            x = block(x, graph)
        # final conv: channels = T axis, kernel (1, nb_time_filter) over F
        # out[b, p, n] = sum_{t, f} X[b, n, f, t] W[p, t, f] + b[p]
        t_out = self.len_input // self.time_strides
        w = self.param(
            "final_conv_w", glorot,
            (self.num_for_predict, t_out, self.nb_time_filter),
        )
        b = self.param("final_conv_b", uniform_init, (self.num_for_predict,))
        out = jnp.einsum("bnft,ptf->bnp", x, w) + b
        return out
