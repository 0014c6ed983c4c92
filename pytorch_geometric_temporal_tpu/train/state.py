"""Training state + managed (async) checkpointing.

The reference has neither: training state lives in loose locals of example
scripts and checkpointing is delegated to Lightning
(``examples/recurrent/lightning_example.py:12-65`` — SURVEY §5).  Here both
are library-level and TPU-shaped:

- :class:`TrainState` is a registered pytree (jit/pjit-transparent), so a
  whole resumable training step can be one compiled function and the state
  can be sharded over a mesh like any other pytree.
- :class:`CheckpointManager` wraps orbax's async manager: saves overlap
  with the next training steps (the save snapshots device buffers, then
  writes in a background thread), with retention + resume built in.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["step", "params", "opt_state"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TrainState:
    """(step, params, optimizer state) as one pytree.

    The optimizer itself (an optax GradientTransformation — a pair of pure
    functions, not data) is passed to :func:`apply_gradients` explicitly,
    keeping the state a plain array pytree that orbax can serialize and
    pjit can shard.
    """

    step: jnp.ndarray
    params: Any
    opt_state: Any

    @staticmethod
    def create(params, optimizer: optax.GradientTransformation) -> "TrainState":
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )


def apply_gradients(state: TrainState, grads,
                    optimizer: optax.GradientTransformation) -> TrainState:
    """One optimizer update; jit/scan-safe (step increments on device)."""
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    return TrainState(
        step=state.step + 1,
        params=optax.apply_updates(state.params, updates),
        opt_state=opt_state,
    )


class CheckpointManager:
    """Async orbax checkpoint manager for :class:`TrainState` (or any pytree).

    Saves are asynchronous by default: device buffers are snapshotted
    synchronously (cheap) and written to disk in a background thread, so
    training continues while the checkpoint lands.  ``max_to_keep`` bounds
    disk use; :meth:`restore` with no step resumes from the latest.

    Usage::

        with CheckpointManager(dir, max_to_keep=3) as mgr:
            state = mgr.restore(template=state) or state
            for ...:
                state = train_step(state, ...)
                mgr.save(int(state.step), state)
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True, save_interval_steps: int = 1):
        import orbax.checkpoint as ocp
        from pathlib import Path

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
                save_interval_steps=save_interval_steps,
            ),
        )

    def save(self, step: int, state: Any) -> bool:
        """Queue an async save; returns whether a save was started
        (False when ``save_interval_steps`` skips this step)."""
        return self._mgr.save(step, args=self._ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None,
                template: Optional[Any] = None) -> Any:
        """Restore ``step`` (default: latest).  Returns None when the
        directory holds no checkpoints.  ``template`` (e.g. a freshly
        created TrainState) restores with matching structure/dtypes/
        shardings — pass it whenever you have one."""
        if step is None:
            step = self.latest_step()
            if step is None:
                return None
        if template is not None:
            return self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self):
        """Block until queued async saves are durable on disk."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
