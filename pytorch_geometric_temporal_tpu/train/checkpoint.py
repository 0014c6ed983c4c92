"""Checkpoint / resume via orbax (absent in the reference — SURVEY §5).

The reference delegates checkpointing to user code / Lightning
(``examples/recurrent/lightning_example.py``); here it is library-level.
"""

from __future__ import annotations

from typing import Any, Optional


def save_checkpoint(path: str, state: Any, step: int = 0, force: bool = True):
    """Save an arbitrary pytree (params / optimizer state / carry)."""
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(f"{path}/step_{step}", state, force=force)


def restore_checkpoint(path: str, step: int = 0,
                       template: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` (a pytree of matching structure, e.g. freshly-initialized
    params) restores with correct shardings/dtypes.
    """
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        if template is not None:
            return ckptr.restore(f"{path}/step_{step}", template)
        return ckptr.restore(f"{path}/step_{step}")


def latest_step(path: str) -> Optional[int]:
    import os
    import re

    if not os.path.isdir(path):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.fullmatch(r"step_(\d+)", d))
    ]
    return max(steps) if steps else None
