"""2s-AGCN: two-stream adaptive graph convolutional network (skeleton actions).

Capability parity with reference ``nn/attention/tsagcn.py:13-343``:
``GraphAAGCN`` (`:13-39`), ``UnitTCN`` (`:42-82`), ``UnitGCN`` with adaptive
data-dependent affinity and STC attention (`:85-271`), ``AAGCN`` (`:274-343`).

Public I/O layout matches the reference: (B, C, T, V); internally channel-
last (B, T, V, C) for TPU-friendly convs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

constant = nn.initializers.constant
kaiming = nn.initializers.kaiming_normal()


class GraphAAGCN:
    """Stacked (3, V, V) adjacency: [I, col-normalized A, col-normalized Aᵀ].

    Mirrors reference ``GraphAAGCN`` (`:26-39`): ``F.normalize(·, dim=0,
    p=1)`` normalizes each column to unit L1 mass.
    """

    def __init__(self, edge_index, num_nodes: int):
        self.num_nodes = num_nodes
        ei = np.asarray(edge_index)
        a = np.zeros((num_nodes, num_nodes), dtype=np.float32)
        a[ei[0], ei[1]] = 1.0

        def col_norm(m):
            s = m.sum(0, keepdims=True)
            return m / np.where(s == 0, 1.0, s)

        self.A = jnp.asarray(
            np.stack([np.eye(num_nodes, dtype=np.float32), col_norm(a),
                      col_norm(a.T)])
        )


class UnitTCN(nn.Module):
    """(k, 1) conv over time + BatchNorm.  Layout (B, T, V, C)."""

    out_channels: int
    kernel_size: int = 9
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_channels, kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1), padding=((pad, pad), (0, 0)),
            kernel_init=kaiming, name="conv",
        )(x)
        return nn.BatchNorm(use_running_average=not train, name="bn")(x)


class UnitGCN(nn.Module):
    """Adaptive multi-subset graph conv with optional STC attention.

    Layout (B, T, V, C).  ``a`` is the (3, V, V) GraphAAGCN stack.
    """

    out_channels: int
    coff_embedding: int = 4
    num_subset: int = 3
    adaptive: bool = True
    attention: bool = True

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        B, T, V, C = x.shape
        inter_c = self.out_channels // self.coff_embedding
        y = 0.0
        if self.adaptive:
            pa = self.param("PA", lambda key, s: jnp.asarray(a), a.shape)
            alpha = self.param("alpha", nn.initializers.zeros, (1,))
            for i in range(self.num_subset):
                a1 = nn.Dense(inter_c, name=f"conv_a_{i}")(x)  # (B,T,V,ic)
                a2 = nn.Dense(inter_c, name=f"conv_b_{i}")(x)
                a1 = a1.transpose(0, 2, 1, 3).reshape(B, V, T * inter_c)
                a2 = a2.transpose(0, 1, 3, 2).reshape(B, T * inter_c, V)
                aff = jnp.tanh(jnp.matmul(a1, a2) / (T * inter_c))  # (B,V,V)
                a_eff = pa[i][None] + aff * alpha
                z = jnp.einsum("btwc,bwv->btvc", x, a_eff)
                y = y + nn.Dense(self.out_channels, name=f"conv_d_{i}")(z)
        else:
            for i in range(self.num_subset):
                z = jnp.einsum("btwc,wv->btvc", x, a[i])
                y = y + nn.Dense(self.out_channels, name=f"conv_d_{i}")(z)
        y = nn.BatchNorm(use_running_average=not train,
                         scale_init=constant(1e-6), name="bn")(y)
        if C != self.out_channels:
            down = nn.Dense(self.out_channels, name="down_conv")(x)
            down = nn.BatchNorm(use_running_average=not train,
                                name="down_bn")(down)
        else:
            down = x
        y = nn.relu(y + down)

        if self.attention:
            # spatial attention (conv over the node axis)
            ker_jpt = V - 1 if V % 2 == 0 else V
            pad_j = (ker_jpt - 1) // 2
            se = y.mean(axis=1)  # (B, V, C)
            se1 = nn.sigmoid(
                nn.Conv(1, kernel_size=(ker_jpt,), padding=((pad_j, pad_j),),
                        kernel_init=nn.initializers.xavier_normal(),
                        name="conv_sa")(se)
            )  # (B, V, 1)
            y = y * se1[:, None] + y
            # temporal attention
            se = y.mean(axis=2)  # (B, T, C)
            se1 = nn.sigmoid(
                nn.Conv(1, kernel_size=(9,), padding=((4, 4),),
                        kernel_init=nn.initializers.zeros,
                        name="conv_ta")(se)
            )  # (B, T, 1)
            y = y * se1[:, :, None] + y
            # channel attention (squeeze-excite)
            se = y.mean(axis=(1, 2))  # (B, C)
            se1 = nn.relu(nn.Dense(self.out_channels // 2, kernel_init=kaiming,
                                   name="fc1c")(se))
            se2 = nn.sigmoid(nn.Dense(self.out_channels,
                                      kernel_init=nn.initializers.zeros,
                                      name="fc2c")(se1))
            y = y * se2[:, None, None] + y
        return y


class AAGCN(nn.Module):
    """forward: (X (B, C_in, T, V)) -> (B, out_channels, T//stride, V)."""

    in_channels: int
    out_channels: int
    edge_index: tuple  # static; converted to the (3, V, V) stack
    num_nodes: int
    stride: int = 1
    residual: bool = True
    adaptive: bool = True
    attention: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != self.num_nodes:
            raise ValueError(
                f"AAGCN expects X (B, C_in, T, V={self.num_nodes}); got "
                f"shape {tuple(x.shape)}."
            )
        a = GraphAAGCN(np.asarray(self.edge_index), self.num_nodes).A
        x = jnp.moveaxis(x, 1, -1)  # (B, T, V, C)
        gcn = UnitGCN(self.out_channels, adaptive=self.adaptive,
                      attention=self.attention, name="gcn1")
        tcn = UnitTCN(self.out_channels, stride=self.stride, name="tcn1")
        out = tcn(gcn(x, a, train), train)
        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = UnitTCN(self.out_channels, kernel_size=1,
                          stride=self.stride, name="residual_tcn")(x, train)
        y = nn.relu(out + res)
        return jnp.moveaxis(y, -1, 1)
