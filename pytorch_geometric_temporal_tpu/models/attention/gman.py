"""GMAN: graph multi-attention network (Zheng et al., AAAI'20).

Capability parity with reference ``nn/attention/gman.py:9-559``:
``Conv2D``/``FullyConnected`` (1×1 conv + BatchNorm stacks, `:9-127`),
``SpatioTemporalEmbedding`` (`:130-190`), ``SpatialAttention`` (`:193-245`),
``TemporalAttention`` (w/ causal mask filled with −2¹⁵+1, `:248-323`),
``GatedFusion`` (`:326-369`), ``SpatioTemporalAttention`` (`:372-409`),
``TransformAttention`` (`:412-477`), ``GMAN`` (`:480-559`).

Head-splitting preserves the reference's quirk of splitting the D = K·d
feature dim into chunks of *size K* (d heads of size K) while scaling by
√d (``gman.py:243-246``).

All 1×1 "convs" are Dense layers (identical math, better XLA fusion); batch
norm runs over the feature axis with stats across (B, T, N).  Pass
``train=True`` (+ mutable 'batch_stats') during training.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

glorot = nn.initializers.glorot_uniform()


class FullyConnected(nn.Module):
    """Stack of (Dense → BatchNorm → activation) blocks (1×1 Conv2D ≡ Dense)."""

    units: Sequence[int]
    activations: Sequence[Optional[Callable]]
    bn_decay: Optional[float] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        momentum = 1.0 - (self.bn_decay if self.bn_decay is not None else 0.1)
        for i, (unit, act) in enumerate(zip(self.units, self.activations)):
            x = nn.Dense(unit, use_bias=self.use_bias,
                         kernel_init=glorot, name=f"dense_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=momentum,
                             name=f"bn_{i}")(x)
            if act is not None:
                x = act(x)
        return x


def _heads(x, K: int):
    """Split the last dim into chunks of size K (reference head quirk)."""
    *lead, D = x.shape
    return x.reshape(*lead, D // K, K)  # (..., h, K)


def _merge(x):
    *lead, h, K = x.shape
    return x.reshape(*lead, h * K)


class SpatioTemporalEmbedding(nn.Module):
    D: int
    bn_decay: float
    steps_per_day: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, se, te, train: bool = False):
        """se: (N, D) spatial embedding; te: (B, T_his+T_pred, 2) int
        (day-of-week, time-of-day).  Returns (B, T, N, D)."""
        fc_se = FullyConnected([self.D, self.D], [nn.relu, None],
                               self.bn_decay, self.use_bias, name="fc_se")
        fc_te = FullyConnected([self.D, self.D], [nn.relu, None],
                               self.bn_decay, self.use_bias, name="fc_te")
        se = fc_se(se[None, None], train)  # (1, 1, N, D)
        dow = jax.nn.one_hot(te[..., 0].astype(jnp.int32) % 7, 7)
        tod = jax.nn.one_hot(
            te[..., 1].astype(jnp.int32) % self.steps_per_day,
            self.steps_per_day,
        )
        te = jnp.concatenate([dow, tod], axis=-1)[:, :, None, :]  # (B,T,1,·)
        te = fc_te(te, train)
        return se + te


class SpatialAttention(nn.Module):
    K: int
    d: int
    bn_decay: float

    @nn.compact
    def __call__(self, x, ste, train: bool = False):
        D = self.K * self.d
        xs = jnp.concatenate([x, ste], axis=-1)
        mk = lambda name: FullyConnected([D], [nn.relu], self.bn_decay, name=name)
        q = _heads(mk("fc_q")(xs, train), self.K)  # (B,T,N,h,K)
        k = _heads(mk("fc_k")(xs, train), self.K)
        v = _heads(mk("fc_v")(xs, train), self.K)
        att = jnp.einsum("btnhk,btmhk->bthnm", q, k) / (self.d ** 0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bthnm,btmhk->btnhk", att, v)
        return FullyConnected([D], [nn.relu], self.bn_decay, name="fc_out")(
            _merge(out), train
        )


class TemporalAttention(nn.Module):
    K: int
    d: int
    bn_decay: float
    mask: bool = True

    @nn.compact
    def __call__(self, x, ste, train: bool = False):
        D = self.K * self.d
        T = x.shape[1]
        xs = jnp.concatenate([x, ste], axis=-1)
        mk = lambda name: FullyConnected([D], [nn.relu], self.bn_decay, name=name)
        q = _heads(mk("fc_q")(xs, train), self.K)  # (B,T,N,h,K)
        k = _heads(mk("fc_k")(xs, train), self.K)
        v = _heads(mk("fc_v")(xs, train), self.K)
        att = jnp.einsum("btnhk,bsnhk->bhnts", q, k) / (self.d ** 0.5)
        if self.mask:
            causal = jnp.tril(jnp.ones((T, T), bool))
            att = jnp.where(causal, att, jnp.float32(-(2 ** 15) + 1))
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnts,bsnhk->btnhk", att, v)
        return FullyConnected([D], [nn.relu], self.bn_decay, name="fc_out")(
            _merge(out), train
        )


class GatedFusion(nn.Module):
    D: int
    bn_decay: float

    @nn.compact
    def __call__(self, hs, ht, train: bool = False):
        xs = FullyConnected([self.D], [None], self.bn_decay, use_bias=False,
                            name="fc_xs")(hs, train)
        xt = FullyConnected([self.D], [None], self.bn_decay, use_bias=True,
                            name="fc_xt")(ht, train)
        z = nn.sigmoid(xs + xt)
        h = z * hs + (1.0 - z) * ht
        return FullyConnected([self.D, self.D], [nn.relu, None],
                              self.bn_decay, name="fc_h")(h, train)


class SpatioTemporalAttention(nn.Module):
    K: int
    d: int
    bn_decay: float
    mask: bool

    @nn.compact
    def __call__(self, x, ste, train: bool = False):
        hs = SpatialAttention(self.K, self.d, self.bn_decay,
                              name="spatial")(x, ste, train)
        ht = TemporalAttention(self.K, self.d, self.bn_decay, self.mask,
                               name="temporal")(x, ste, train)
        h = GatedFusion(self.K * self.d, self.bn_decay, name="fusion")(
            hs, ht, train
        )
        return x + h


class TransformAttention(nn.Module):
    K: int
    d: int
    bn_decay: float

    @nn.compact
    def __call__(self, x, ste_his, ste_pred, train: bool = False):
        D = self.K * self.d
        mk = lambda name: FullyConnected([D], [nn.relu], self.bn_decay, name=name)
        q = _heads(mk("fc_q")(ste_pred, train), self.K)  # (B,P,N,h,K)
        k = _heads(mk("fc_k")(ste_his, train), self.K)   # (B,H,N,h,K)
        v = _heads(mk("fc_v")(x, train), self.K)
        att = jnp.einsum("bpnhk,bsnhk->bhnps", q, k) / (self.d ** 0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnps,bsnhk->bpnhk", att, v)
        return FullyConnected([D], [nn.relu], self.bn_decay, name="fc_out")(
            _merge(out), train
        )


class GMAN(nn.Module):
    """forward: (X (B, num_his, N), SE (N, K·d), TE (B, num_his+num_pred, 2))
    -> (B, num_pred, N)."""

    L: int
    K: int
    d: int
    num_his: int
    bn_decay: float
    steps_per_day: int
    use_bias: bool = True
    mask: bool = True

    @nn.compact
    def __call__(self, x, se, te, train: bool = False):
        if x.ndim != 3 or x.shape[1] != self.num_his:
            raise ValueError(
                f"GMAN expects X (B, num_his={self.num_his}, N); got shape "
                f"{tuple(x.shape)}."
            )
        if se.shape[-1] != self.K * self.d or se.shape[0] != x.shape[2]:
            raise ValueError(
                f"GMAN expects SE (N={x.shape[2]}, K*d={self.K * self.d}); "
                f"got shape {tuple(se.shape)}."
            )
        if te.ndim != 3 or te.shape[-1] != 2 or te.shape[1] <= self.num_his:
            raise ValueError(
                "GMAN expects TE (B, num_his+num_pred, 2) of (day-of-week, "
                f"time-of-day) indices; got shape {tuple(te.shape)}."
            )
        D = self.K * self.d
        x = x[..., None]
        x = FullyConnected([D, D], [nn.relu, None], self.bn_decay,
                           name="fc_in")(x, train)
        ste = SpatioTemporalEmbedding(D, self.bn_decay, self.steps_per_day,
                                      self.use_bias, name="st_embedding")(
            se, te, train
        )
        ste_his = ste[:, : self.num_his]
        ste_pred = ste[:, self.num_his :]
        for i in range(self.L):
            x = SpatioTemporalAttention(self.K, self.d, self.bn_decay,
                                        self.mask, name=f"enc_{i}")(
                x, ste_his, train
            )
        x = TransformAttention(self.K, self.d, self.bn_decay,
                               name="transform")(x, ste_his, ste_pred, train)
        for i in range(self.L):
            x = SpatioTemporalAttention(self.K, self.d, self.bn_decay,
                                        self.mask, name=f"dec_{i}")(
                x, ste_pred, train
            )
        x = FullyConnected([D, 1], [nn.relu, None], self.bn_decay,
                           name="fc_out")(x, train)
        return x[..., 0]
