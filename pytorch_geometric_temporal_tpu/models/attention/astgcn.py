"""ASTGCN: attention-based spatial-temporal GCN (Guo et al., AAAI'19).

Capability parity with reference ``nn/attention/astgcn.py:16-610``:
``ChebConvAttention`` (`:16-190`), ``SpatialAttention`` (`:203-262`),
``TemporalAttention`` (`:265-328`), ``ASTGCNBlock`` (`:331-480`),
``ASTGCN`` (`:483-610`).

TPU-first notes:

- ChebConvAttention has two execution modes.  **Dense** (reference-scale
  N ≤ a few thousand): the scaled Laplacian becomes an (N, N) matrix once
  per trace and every hop is a batched einsum over the full (B, T, N, F)
  tensor — the reference loops Python over T (``astgcn.py:442-471``).
  **Edge** (large N): L̂ stays a sparse :class:`Graph`; the attention-scaled
  hop 1 is a per-batch weighted ``spmm`` with the attention gathered at
  L̂'s edge pairs (the sddmm-style form of reference ``astgcn.py:169-178``,
  where the per-edge norm is scaled by ``S[:, row, col]``), and hops ≥ 2
  are plain sparse ``spmm``.  Given the same attention matrix the two modes
  are numerically identical (asserted in ``tests/test_astgcn_sparse.py``).
- Reference quirks preserved: hop-1 messages are attention-scaled, hops ≥ 2
  use the raw Chebyshev norm (`:169-178`); T_0 is X scaled by the attention
  diagonal (`:161-167`); self-loops removed before the Laplacian (`:93`).
- λ_max for non-'sym' normalization is computed in-trace by power iteration
  (replaces scipy ``LaplacianLambdaMax``, `:437-440`).
- Dynamic per-step edge lists are supported by passing a list of Graphs
  (one per input step, pre-padded).
- For N past any sensible dense size the full model runs with
  ``ASTGCN(attention_mode='edge')``: spatial attention switches to
  :class:`SpatialAttentionSparse` (factored per-edge scores + column
  segment-softmax — the reference's (N, N) ``Vs``/``bs`` parameters are
  dense by construction and have no sparse counterpart, a documented
  deviation) and no (N, N) tensor is ever materialized.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.graph import Graph, cheb_norm, lambda_max as power_lambda_max
from ...ops.spmm import spmm, spmm_segment
from ..conv import glorot

uniform_init = nn.initializers.uniform(scale=1.0)


class EdgeScores(NamedTuple):
    """Spatial attention restricted to graph edges (the sparse form).

    ``edge`` (B, E_pad) holds scores for the ORIGINAL graph's edge list
    (padding entries ignored); ``diag`` (B, N) the per-node self scores —
    together the exact support ChebConvAttention reads from a dense S.
    """

    edge: jnp.ndarray
    diag: jnp.ndarray


def _lhat_graph(graph: Graph, normalization: Optional[str]) -> Graph:
    """Sparse scaled Laplacian L̂ as a Graph (edge layout is deterministic:
    [original E edges, Laplacian-diagonal N, −1 self-loop N, padding])."""
    g = graph.remove_self_loops()
    if normalization == "sym":
        lam = None
    else:
        lam = power_lambda_max(g, normalization)
    return cheb_norm(g, normalization, lam)


def _lhat_dense(graph: Graph, normalization: Optional[str]) -> jnp.ndarray:
    """Dense scaled Laplacian L̂[i, j] for ChebConvAttention."""
    if graph.num_nodes > 8192:
        raise ValueError(
            f"ChebConvAttention/ASTGCN in dense mode materializes the "
            f"(N, N) scaled Laplacian AND a per-batch (B, N, N) spatial "
            f"attention — O(N²) memory; N={graph.num_nodes} is past any "
            "sensible dense size. Use attention_mode='edge' (sparse L̂ + "
            "per-edge attention, no (N, N) tensors) for large graphs."
        )
    return _lhat_graph(graph, normalization).to_adj()
    # [senders=row, receivers=col] -> L[row, col]


class ChebConvAttention(nn.Module):
    """Chebyshev conv with spatial-attention-scaled first hop.

    forward: (x (B, T, N, F) or (B, N, F), graph | [graphs], S) -> same
    leading shape with F -> out_channels.  ``S`` is either a dense
    (B, N, N) attention matrix or an :class:`EdgeScores` (sparse form).

    ``mode``: 'dense' | 'edge' | 'auto'.  Dense is one (N, N) einsum per
    hop (fastest at reference scale); edge keeps L̂ sparse and scales the
    per-edge norm by the gathered attention — bit-equal to dense given the
    same S, and the only mode that runs at large N.  'auto' picks edge when
    N exceeds the dense threshold or when S arrives as EdgeScores.
    """

    out_channels: int
    K: int
    normalization: Optional[str] = "sym"
    use_bias: bool = True
    mode: str = "auto"

    def _edge_mode(self, n: int, s) -> bool:
        if self.mode in ("dense", "edge"):
            return self.mode == "edge"
        if isinstance(s, EdgeScores):
            return True
        from ...config import get_config

        return n > get_config().dense_threshold

    def _edge_path(self, x, graph: Graph, s, w):
        """Sparse-L̂ evaluation; x (B, T, N, F) -> (B, T, N, C)."""
        if hasattr(graph, "ops"):  # PreparedGraph -> underlying Graph
            graph = graph.graph
        lhat = _lhat_graph(graph, self.normalization)
        # einsum('ij,btjf->btif', L, v) aggregates INTO the sender side of
        # the L̂ edge list (the reference's transposed propagate): spmm on
        # the reversed graph computes exactly that.
        rev = lhat.reverse()
        if isinstance(s, EdgeScores):
            e = graph.num_edges
            n = graph.num_nodes
            pad = lhat.senders.shape[0] - (e + 2 * n)
            # L̂ layout: [orig E, lap-diag N, −1-loop N, padding] — both
            # diagonal entry groups read the per-node self score, exactly
            # like the dense path reading S[b, i, i] twice via .at[].add.
            s_edge = jnp.concatenate(
                [s.edge[:, :e], s.diag, s.diag,
                 jnp.zeros((s.edge.shape[0], pad), s.edge.dtype)], axis=1,
            )
            s_diag = s.diag
        else:
            s_edge = s[:, lhat.senders, lhat.receivers]  # (B, E_lhat)
            s_diag = jnp.einsum("bii->bi", s)
        w_e = rev.masked_weights()
        tax0 = x * s_diag[:, None, :, None]
        hop1 = jax.vmap(
            lambda xb, sb: spmm_segment(rev, xb, weights=w_e * sb)
        )(tax0, s_edge)
        out = jnp.einsum("btnf,fo->btno", tax0, w[0])
        if self.K > 1:
            tax1 = hop1
            out = out + jnp.einsum("btnf,fo->btno", tax1, w[1])
            for k in range(2, self.K):
                tax2 = 2.0 * spmm(rev, tax1) - tax0
                out = out + jnp.einsum("btnf,fo->btno", tax2, w[k])
                tax0, tax1 = tax1, tax2
        return out

    @nn.compact
    def __call__(self, x, graph: Union[Graph, Sequence[Graph]], spatial_attention):
        squeeze_t = x.ndim == 3
        if squeeze_t:
            x = x[:, None]  # (B, 1, N, F)
        B, T, N, F = x.shape
        s = spatial_attention  # (B, N, N) or EdgeScores

        w = self.param("weight", glorot, (self.K, F, self.out_channels))

        if self._edge_mode(N, s) and not isinstance(graph, (list, tuple)):
            out = self._edge_path(x, graph, s, w)
            if self.use_bias:
                out = out + self.param(
                    "bias", uniform_init, (self.out_channels,)
                )
            return out[:, 0] if squeeze_t else out
        if isinstance(s, EdgeScores):
            raise ValueError(
                "EdgeScores attention requires edge mode with a single "
                "Graph (per-step graph lists run the dense path)"
            )

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


class SpatialAttentionSparse(nn.Module):
    """Edge-restricted spatial attention producing :class:`EdgeScores`.

    The sparse counterpart of :class:`SpatialAttention` for large graphs:
    the same factored bilinear form ``lhs[b, i] · rhs[b, j]`` is evaluated
    ONLY at graph edge pairs (sddmm) plus the diagonal, passed through a
    sigmoid, and normalized with a segment softmax over each column j's
    incident entries — mirroring the dense module's ``softmax(axis=1)``
    restricted to the support ChebConvAttention actually reads.

    Documented deviation from the dense reference module
    (``nn/attention/astgcn.py:230-262``): the (N, N) ``Vs`` row-mixing and
    (N, N) ``bs`` bias are dense-by-construction parameters with no sparse
    counterpart; this module replaces them with a scalar bias.  At
    reference scale use the dense module (exact parity); this one exists so
    ASTGCN runs at N ≫ 10⁴.
    """

    in_channels: int
    num_of_timesteps: int

    @nn.compact
    def __call__(self, x, graph: Graph) -> EdgeScores:
        # x: (B, N, F, T)
        if hasattr(graph, "ops"):  # PreparedGraph
            graph = graph.graph
        F_, T = self.in_channels, self.num_of_timesteps
        w1 = self.param("W1", uniform_init, (T,))
        w2 = self.param("W2", glorot, (F_, T))
        w3 = self.param("W3", uniform_init, (F_,))
        b = self.param("bs", uniform_init, (1,))
        lhs = jnp.einsum("bnft,t->bnf", x, w1)
        lhs = jnp.einsum("bnf,ft->bnt", lhs, w2)   # (B, N, T)
        rhs = jnp.einsum("f,bnft->bnt", w3, x)     # (B, N, T)
        i, j = graph.senders, graph.receivers
        raw_e = nn.sigmoid(
            jnp.einsum("bet,bet->be", lhs[:, i], rhs[:, j]) + b
        )                                           # (B, E_pad)
        raw_d = nn.sigmoid(
            jnp.einsum("bnt,bnt->bn", lhs, rhs) + b
        )                                           # (B, N)
        # segment softmax over column j (edges into j + the diagonal entry)
        n = graph.num_nodes
        mask = graph.edge_mask(raw_e.dtype)
        neg = jnp.asarray(-1e30, raw_e.dtype)
        m = jax.ops.segment_max(
            jnp.where(mask > 0, raw_e, neg).T, j, num_segments=n
        ).T                                         # (B, N)
        m = jnp.maximum(m, raw_d)
        exp_e = jnp.exp(raw_e - m[:, j]) * mask
        exp_d = jnp.exp(raw_d - m)
        denom = jax.ops.segment_sum(exp_e.T, j, num_segments=n).T + exp_d
        return EdgeScores(edge=exp_e / denom[:, j], diag=exp_d / denom)


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
    attention_mode: str = "dense"

    @nn.compact
    def __call__(self, x, graph):
        B, N, F_, T = x.shape
        e = TemporalAttention(self.in_channels, N, T, name="temporal_attention")(x)
        x_tilde = jnp.einsum("bnft,bts->bnfs", x, e)
        if self.attention_mode == "edge":
            g0 = graph[0] if isinstance(graph, (list, tuple)) else graph
            s = SpatialAttentionSparse(
                self.in_channels, T, name="spatial_attention"
            )(x_tilde, g0)
        else:
            s = SpatialAttention(
                self.in_channels, N, T, name="spatial_attention"
            )(x_tilde)
        conv = ChebConvAttention(
            self.nb_chev_filter, self.K, self.normalization, self.use_bias,
            mode=self.attention_mode if self.attention_mode == "edge" else "auto",
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
    """forward: (X (B, N, F_in, T_in), graph | [graphs]) -> (B, N, T_out).

    ``attention_mode``: 'dense' (reference-exact, O(N²) — reference
    datasets have N ≤ 325), 'edge' (sparse L̂ + per-edge attention, no
    (N, N) tensors — the large-graph mode), or 'auto' (edge above the
    dense threshold).
    """

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
    attention_mode: str = "auto"

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
        mode = self.attention_mode
        if mode == "auto":
            from ...config import get_config

            mode = (
                "edge"
                if self.num_of_vertices > get_config().dense_threshold
                else "dense"
            )
        blocks = [
            ASTGCNBlock(
                self.in_channels, self.K, self.nb_chev_filter,
                self.nb_time_filter, self.time_strides, self.num_of_vertices,
                self.len_input, self.normalization, self.use_bias,
                attention_mode=mode, name="block_0",
            )
        ] + [
            ASTGCNBlock(
                self.nb_time_filter, self.K, self.nb_chev_filter,
                self.nb_time_filter, 1, self.num_of_vertices,
                self.len_input // self.time_strides, self.normalization,
                self.use_bias, attention_mode=mode, name=f"block_{i + 1}",
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
