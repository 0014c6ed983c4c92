"""Tests for profiling utilities and training guards."""

import time

import jax.numpy as jnp
import numpy as np

from pytorch_geometric_temporal_tpu.train.guards import (
    DivergenceGuard,
    loss_is_finite,
)
from pytorch_geometric_temporal_tpu.utils import StepTimer, device_memory_stats


def test_step_timer(tmp_path):
    timer = StepTimer(items_per_step=10, warmup=1)
    for _ in range(4):
        with timer:
            time.sleep(0.01)
    assert timer.steps == 4
    assert 0.005 < timer.mean_step_time() < 0.1
    assert timer.throughput() > 0
    timer.write_csv(str(tmp_path / "t.csv"))
    assert (tmp_path / "t.csv").read_text().startswith("step,")


def test_divergence_guard_rollback():
    g = DivergenceGuard(explode_factor=2.0)
    p0, s0 = {"w": 1.0}, {"m": 0.0}
    p, s, ok = g.check(p0, s0, jnp.float32(1.0))
    assert ok
    # exploding loss -> rollback to last good state
    p_bad = {"w": 999.0}
    p, s, ok = g.check(p_bad, s0, jnp.float32(50.0))
    assert not ok and p == p0
    # NaN -> rollback
    p, s, ok = g.check(p_bad, s0, jnp.float32(float("nan")))
    assert not ok and p == p0


def test_loss_is_finite():
    assert bool(loss_is_finite(jnp.float32(1.0)))
    assert not bool(loss_is_finite(jnp.float32(float("inf"))))


def test_device_memory_stats():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
