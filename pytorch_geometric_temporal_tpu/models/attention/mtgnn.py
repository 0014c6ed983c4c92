"""MTGNN: multivariate time-series forecasting GNN (Wu et al., KDD'20).

Capability parity with reference ``nn/attention/mtgnn.py:12-686``:
``Linear`` (`:12-48`), ``MixProp`` (`:51-102`), ``DilatedInception``
(`:105-152`), ``GraphConstructor`` (directed learned adjacency, top-k
sparsified per row, `:155-227`), ``LayerNormalization`` (node-indexed affine,
`:230-286`), ``MTGNNLayer`` (`:289-449`), ``MTGNN`` (`:452-686`) including
receptive-field arithmetic and front-padding when seq < receptive field.

Internal layout is channel-last (B, N, T, C) for TPU-friendly convs; the
public ``MTGNN.__call__`` accepts the reference layout (B, C_in, N, T) and
returns (B, out_dim, N, 1).
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

glorot = nn.initializers.glorot_uniform()
uniform_init = nn.initializers.uniform(scale=1.0)


class MixProp(nn.Module):
    """Mix-hop propagation: H_k = α·X + (1−α)·Ā H_{k−1}, concat, MLP."""

    c_out: int
    gdep: int
    dropout: float
    alpha: float

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        # x: (B, N, T, C); a: (N, N)
        n = a.shape[0]
        a = a + jnp.eye(n, dtype=a.dtype)
        d = a.sum(1)
        a = a / d[:, None]
        h = x
        out = [x]
        for _ in range(self.gdep):
            h = self.alpha * x + (1.0 - self.alpha) * jnp.einsum(
                "vw,bwtc->bvtc", a, h
            )
            out.append(h)
        h0 = jnp.concatenate(out, axis=-1)
        return nn.Dense(self.c_out, kernel_init=glorot, name="mlp")(h0)


class DilatedInception(nn.Module):
    """Parallel (1, k) dilated convs, truncated to the shortest output."""

    c_out: int
    kernel_set: List[int]
    dilation_factor: int

    @nn.compact
    def __call__(self, x):
        # x: (B, N, T, C)
        c_each = self.c_out // len(self.kernel_set)
        outs = []
        for i, kern in enumerate(self.kernel_set):
            outs.append(
                nn.Conv(
                    c_each, kernel_size=(1, kern),
                    kernel_dilation=(1, self.dilation_factor),
                    padding="VALID", kernel_init=glorot, name=f"conv_{i}",
                )(x)
            )
        t_min = outs[-1].shape[2]
        outs = [o[:, :, -t_min:] for o in outs]
        return jnp.concatenate(outs, axis=-1)


class GraphConstructor(nn.Module):
    """Learned directed adjacency A = relu(tanh(α(M₁M₂ᵀ − M₂M₁ᵀ))), top-k."""

    nnodes: int
    k: int
    dim: int
    alpha: float
    xd: Optional[int] = None

    @nn.compact
    def __call__(self, idx, fe=None):
        if fe is None:
            emb1 = self.param("embedding1", glorot, (self.nnodes, self.dim))
            emb2 = self.param("embedding2", glorot, (self.nnodes, self.dim))
            v1 = emb1[idx]
            v2 = emb2[idx]
            v1 = jnp.tanh(self.alpha * nn.Dense(self.dim, kernel_init=glorot,
                                                name="linear1")(v1))
            v2 = jnp.tanh(self.alpha * nn.Dense(self.dim, kernel_init=glorot,
                                                name="linear2")(v2))
        else:
            v1 = fe[idx]
            v1 = jnp.tanh(self.alpha * nn.Dense(self.dim, kernel_init=glorot,
                                                name="linear1")(v1))
            v2 = jnp.tanh(self.alpha * nn.Dense(self.dim, kernel_init=glorot,
                                                name="linear2")(fe[idx]))
        n = v1.shape[0]
        if n > 8192:
            raise ValueError(
                f"MTGNN's GraphConstructor materializes an (N, N) learned "
                f"adjacency — O(N²); N={n} would allocate "
                f"{n * n * 4 / 2**30:.1f} GiB. The model is dense by "
                "construction; its own large-N mechanism (reference "
                "nn/attention/mtgnn.py: the `idx` argument) is subgraph "
                "training — pass a sampled node subset as `idx` each step "
                "so the constructed adjacency covers only that subset."
            )
        a = v1 @ v2.T - v2 @ v1.T
        a = nn.relu(jnp.tanh(self.alpha * a))
        # top-k per row sparsification (reference `:221-226`)
        _, top_idx = jax.lax.top_k(a, self.k)
        mask = jnp.zeros_like(a)
        rows = jnp.arange(n)[:, None]
        mask = mask.at[rows, top_idx].set(1.0)
        return a * mask


class NodeIndexedLayerNorm(nn.Module):
    """LayerNorm over (N, T, C) with affine params indexed by node perm."""

    shape: tuple  # (N, T, C)
    elementwise_affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, idx):
        # x: (B, N, T, C)
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.elementwise_affine:
            w = self.param("weight", nn.initializers.ones, self.shape)
            b = self.param("bias", nn.initializers.zeros, self.shape)
            xn = xn * w[idx][None] + b[idx][None]
        return xn


class MTGNNLayer(nn.Module):
    dilation_exponential: int
    rf_size_i: int
    kernel_size: int
    j: int
    residual_channels: int
    conv_channels: int
    skip_channels: int
    kernel_set: List[int]
    new_dilation: int
    layer_norm_affline: bool
    gcn_true: bool
    seq_length: int
    receptive_field: int
    dropout: float
    gcn_depth: int
    num_nodes: int
    propalpha: float

    @nn.compact
    def __call__(self, x, x_skip, a_tilde, idx, train: bool = False):
        if self.dilation_exponential > 1:
            rf_size_j = int(
                self.rf_size_i
                + (self.kernel_size - 1)
                * (self.dilation_exponential ** self.j - 1)
                / (self.dilation_exponential - 1)
            )
        else:
            rf_size_j = self.rf_size_i + self.j * (self.kernel_size - 1)
        t_len = max(self.seq_length, self.receptive_field) - rf_size_j + 1

        x_residual = x
        x_filter = jnp.tanh(
            DilatedInception(self.conv_channels, self.kernel_set,
                             self.new_dilation, name="filter_conv")(x)
        )
        x_gate = nn.sigmoid(
            DilatedInception(self.conv_channels, self.kernel_set,
                             self.new_dilation, name="gate_conv")(x)
        )
        x = x_filter * x_gate
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x_skip = nn.Conv(
            self.skip_channels, kernel_size=(1, x.shape[2]), padding="VALID",
            kernel_init=glorot, name="skip_conv",
        )(x) + x_skip
        if self.gcn_true:
            x = MixProp(self.residual_channels, self.gcn_depth, self.dropout,
                        self.propalpha, name="mixprop1")(x, a_tilde, train) + \
                MixProp(self.residual_channels, self.gcn_depth, self.dropout,
                        self.propalpha, name="mixprop2")(x, a_tilde.T, train)
        else:
            x = nn.Dense(self.residual_channels, kernel_init=glorot,
                         name="residual_conv")(x)
        x = x + x_residual[:, :, -x.shape[2]:]
        x = NodeIndexedLayerNorm(
            (self.num_nodes, t_len, self.residual_channels),
            self.layer_norm_affline, name="norm",
        )(x, idx)
        return x, x_skip


class MTGNN(nn.Module):
    """forward: (X_in (B, C_in, N, T), A_tilde=None, idx=None, FE=None)
    -> (B, out_dim, N, 1)."""

    gcn_true: bool
    build_adj: bool
    gcn_depth: int
    num_nodes: int
    kernel_set: List[int]
    kernel_size: int
    dropout: float
    subgraph_size: int
    node_dim: int
    dilation_exponential: int
    conv_channels: int
    residual_channels: int
    skip_channels: int
    end_channels: int
    seq_length: int
    in_dim: int
    out_dim: int
    layers: int
    propalpha: float
    tanhalpha: float
    layer_norm_affline: bool
    xd: Optional[int] = None

    @property
    def receptive_field(self) -> int:
        if self.dilation_exponential > 1:
            return int(
                1
                + (self.kernel_size - 1)
                * (self.dilation_exponential ** self.layers - 1)
                / (self.dilation_exponential - 1)
            )
        return self.layers * (self.kernel_size - 1) + 1

    @nn.compact
    def __call__(self, x_in, a_tilde=None, idx=None, fe=None,
                 train: bool = False):
        if x_in.shape[3] != self.seq_length:
            raise ValueError(
                "Input sequence length not equal to preset sequence length."
            )
        rf = self.receptive_field
        x_in = jnp.moveaxis(x_in, 1, -1)  # (B, N, T, C)
        if self.seq_length < rf:
            x_in = jnp.pad(x_in, ((0, 0), (0, 0), (rf - self.seq_length, 0),
                                  (0, 0)))
        if idx is None:
            idx = jnp.arange(self.num_nodes)
        if self.gcn_true and self.build_adj:
            a_tilde = GraphConstructor(
                self.num_nodes, self.subgraph_size, self.node_dim,
                self.tanhalpha, self.xd, name="graph_constructor",
            )(idx, fe)

        x = nn.Dense(self.residual_channels, kernel_init=glorot,
                     name="start_conv")(x_in)
        x0 = nn.Dropout(self.dropout, deterministic=not train)(x_in)
        x_skip = nn.Conv(
            self.skip_channels, kernel_size=(1, max(self.seq_length, rf)),
            padding="VALID", kernel_init=glorot, name="skip_conv_0",
        )(x0)

        new_dilation = 1
        for j in range(1, self.layers + 1):
            layer = MTGNNLayer(
                dilation_exponential=self.dilation_exponential,
                rf_size_i=1,
                kernel_size=self.kernel_size,
                j=j,
                residual_channels=self.residual_channels,
                conv_channels=self.conv_channels,
                skip_channels=self.skip_channels,
                kernel_set=self.kernel_set,
                new_dilation=new_dilation,
                layer_norm_affline=self.layer_norm_affline,
                gcn_true=self.gcn_true,
                seq_length=self.seq_length,
                receptive_field=rf,
                dropout=self.dropout,
                gcn_depth=self.gcn_depth,
                num_nodes=self.num_nodes,
                propalpha=self.propalpha,
                name=f"layer_{j - 1}",
            )
            x, x_skip = layer(x, x_skip, a_tilde, idx, train)
            new_dilation *= self.dilation_exponential

        x_skip = nn.Conv(
            self.skip_channels, kernel_size=(1, x.shape[2]), padding="VALID",
            kernel_init=glorot, name="skip_conv_E",
        )(x) + x_skip
        x = nn.relu(x_skip)
        x = nn.relu(nn.Dense(self.end_channels, kernel_init=glorot,
                             name="end_conv_1")(x))
        x = nn.Dense(self.out_dim, kernel_init=glorot, name="end_conv_2")(x)
        return jnp.moveaxis(x, -1, 1)  # (B, out_dim, N, 1)
