"""Mixed-precision training recipe (bf16-first, TPU-shaped).

The reference trains in f32 everywhere (no AMP/autocast anywhere in its
tree).  On TPU the MXU natively multiplies bf16 tiles, and HBM traffic —
the usual bottleneck (see the guide) — halves in bf16, so the idiomatic
recipe is:

- **master params in f32** (optimizer state too),
- **compute in bf16**: params and float inputs are cast once per step, and
  every model in this package follows its input dtype (hidden states are
  created with ``x.dtype``, matmuls use ``preferred_element_type=x.dtype``),
- **loss/grads in f32** (grads arrive in f32 because the cast is
  differentiated: its transpose is a cast *back* to f32 with accumulation).

bf16 shares f32's exponent range, so loss scaling is unnecessary for it —
:class:`DynamicLossScale` exists for the f16 policy and for parity with
GPU-style AMP recipes, with the standard grow/shrink-on-overflow schedule.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .state import TrainState, apply_gradients


def _cast_floats(tree: Any, dtype) -> Any:
    """Cast only inexact (float) leaves; ints/bools (edge indices, masks)
    pass through untouched."""

    def leaf(x):
        if isinstance(x, (jnp.ndarray, jax.Array)) and jnp.issubdtype(
            x.dtype, jnp.inexact
        ):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(leaf, tree)


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: where params live, where compute happens."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return _cast_floats(tree, self.compute_dtype)

    def cast_to_param(self, tree):
        return _cast_floats(tree, self.param_dtype)

    def cast_output(self, tree):
        return _cast_floats(tree, self.output_dtype)


bf16_policy = Policy()
f32_policy = Policy(compute_dtype=jnp.float32)
f16_policy = Policy(compute_dtype=jnp.float16)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["scale", "steps_since_growth"],
    meta_fields=["growth_factor", "shrink_factor", "growth_interval"],
)
@dataclasses.dataclass(frozen=True)
class DynamicLossScale:
    """AMP-style dynamic loss scale (needed for f16, NOT for bf16).

    Multiply the loss by ``scale`` before differentiation, divide grads by
    it after; on non-finite grads shrink the scale and skip the update, on
    ``growth_interval`` consecutive finite steps grow it.
    """

    scale: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(2.0**15)
    )
    steps_since_growth: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.int32(0)
    )
    growth_factor: float = 2.0
    shrink_factor: float = 0.5
    growth_interval: int = 2000

    def scale_loss(self, loss):
        return loss * self.scale.astype(loss.dtype)

    def unscale(self, grads):
        inv = (1.0 / self.scale).astype(jnp.float32)
        return jax.tree_util.tree_map(
            lambda g: g * inv.astype(g.dtype), grads
        )

    def adjust(self, grads_finite) -> "DynamicLossScale":
        grew = self.steps_since_growth + 1 >= self.growth_interval
        new_scale = jnp.where(
            grads_finite,
            jnp.where(grew, self.scale * self.growth_factor, self.scale),
            self.scale * self.shrink_factor,
        )
        new_counter = jnp.where(
            grads_finite & ~grew, self.steps_since_growth + 1, jnp.int32(0)
        )
        return DynamicLossScale(
            scale=new_scale,
            steps_since_growth=new_counter,
            growth_factor=self.growth_factor,
            shrink_factor=self.shrink_factor,
            growth_interval=self.growth_interval,
        )


def all_finite(tree) -> jnp.ndarray:
    leaves = [
        jnp.all(jnp.isfinite(x))
        for x in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
    ]
    if not leaves:
        return jnp.bool_(True)
    return jnp.stack(leaves).all()


def make_mixed_precision_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    policy: Policy = bf16_policy,
    dynamic_scale: bool = False,
):
    """Build a jittable mixed-precision train step.

    ``loss_fn(params, *batch) -> scalar`` is written dtype-agnostically (as
    all models in this package are); the step casts params and the float
    leaves of the batch to ``policy.compute_dtype`` inside the
    differentiated function, keeps f32 master params, and applies the
    optimizer in f32.

    Returns ``step(state, *batch) -> (state, loss)`` or, with
    ``dynamic_scale=True``,
    ``step(state, loss_scale, *batch) -> (state, loss_scale, loss)`` where
    non-finite-grad steps are skipped (params/opt state unchanged) and the
    scale adapts.
    """

    def forward(params, scale: Optional[DynamicLossScale], batch):
        pc = policy.cast_to_compute(params)
        bc = tuple(policy.cast_to_compute(b) for b in batch)
        loss = loss_fn(pc, *bc).astype(jnp.float32)
        if scale is not None:
            return scale.scale_loss(loss), loss
        return loss, loss

    if not dynamic_scale:

        def step(state: TrainState, *batch):
            (_, loss), grads = jax.value_and_grad(
                lambda p: forward(p, None, batch), has_aux=True
            )(state.params)
            grads = policy.cast_to_param(grads)
            return apply_gradients(state, grads, optimizer), loss

        return step

    def step_scaled(state: TrainState, scale: DynamicLossScale, *batch):
        (_, loss), grads = jax.value_and_grad(
            lambda p: forward(p, scale, batch), has_aux=True
        )(state.params)
        grads = scale.unscale(policy.cast_to_param(grads))
        finite = all_finite(grads)
        new_state = apply_gradients(state, grads, optimizer)
        # skip the update (keep old state) when grads overflowed
        merged = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_state, state
        )
        return merged, scale.adjust(finite), loss

    return step_scaled
