"""Profiling / observability utilities.

The reference has none in-library (SURVEY §5: examples time epochs with
``time.time()`` and poll psutil/NVML to CSV).  Here: a step timer with
throughput accounting, a ``jax.profiler`` trace context, and device memory
stats.
"""

from __future__ import annotations

import contextlib
import csv
import time
from typing import Optional


class StepTimer:
    """Wall-clock step timing with rolling throughput.

    Usage::

        timer = StepTimer(items_per_step=batch * seq_len)
        for batch in loader:
            with timer:
                params, ... = train_step(...)   # must block on result
        print(timer.summary())
    """

    def __init__(self, items_per_step: int = 1, warmup: int = 1):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def steps(self) -> int:
        return len(self.times)

    def mean_step_time(self) -> float:
        t = self.times[self.warmup :] or self.times
        return sum(t) / max(len(t), 1)

    def throughput(self) -> float:
        m = self.mean_step_time()
        return self.items_per_step / m if m > 0 else 0.0

    def summary(self) -> str:
        return (
            f"{self.steps} steps, {self.mean_step_time() * 1e3:.2f} ms/step, "
            f"{self.throughput():.1f} items/s"
        )

    def write_csv(self, path: str):
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["step", "seconds"])
            for i, t in enumerate(self.times):
                w.writerow([i, t])


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: Optional[int] = None):
    """``jax.profiler`` trace context; view with TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    """Per-device memory stats (bytes) when the backend exposes them."""
    import jax

    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    out = stats() if callable(stats) else None
    return out if isinstance(out, dict) else {}


def host_memory_stats() -> dict:
    """Host process memory (bytes): current and peak RSS.

    Reads ``/proc/self/status`` (Linux); returns an empty dict elsewhere.
    Used by the out-of-core data-path tests to assert that streaming a
    memory-mapped series never materializes it
    (``tests/test_out_of_core.py``).
    """
    out = {}
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    out["rss"] = int(line.split()[1]) * 1024
                elif line.startswith("VmHWM:"):
                    out["peak_rss"] = int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover - non-Linux
        pass
    return out


def device_time_per_iter(fn, x, iters: int = 400, lo_frac: float = 0.25,
                         reps: int = 3, operands=()) -> float:
    """Per-iteration device time of ``x -> fn(x)``, dispatch-corrected.

    Remotely attached TPU platforms carry a large FIXED per-execution
    overhead (~25 ms measured on the axon tunnel — constant from 1 to 1000
    loop iterations), which a naive total/iters division smears into every
    per-iteration number.  This times ONE compiled executable at two
    different loop lengths (the bound is a traced scalar, so both lengths
    share one compile) and takes the slope::

        t = (T(hi) - T(lo)) / (hi - lo)

    which cancels the fixed overhead exactly.  ``fn`` must be
    shape-preserving and non-expanding (the carried value must stay finite
    across the loop).

    ``operands``: extra pytrees passed as jit ARGUMENTS to
    ``fn(x, *operands)`` each iteration.  Use this for any large constant
    (a BCSR operator, a stacked graph) — closing over it instead bakes it
    into the HLO as literals, which blows the remote-compile payload
    limit on tunneled platforms and the constant-folding budget anywhere.
    """
    import jax

    @jax.jit
    def run(x0, n, *ops):
        out = jax.lax.fori_loop(0, n, lambda i, a: fn(a, *ops), x0)
        return jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + leaf.sum(), out, 0.0
        )

    lo = max(int(iters * lo_frac), 1)
    float(run(x, iters, *operands))  # compile + pipeline fill
    t_hi = t_lo = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, iters, *operands))
        t_hi = min(t_hi, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run(x, lo, *operands))
        t_lo = min(t_lo, time.perf_counter() - t0)
    return max(t_hi - t_lo, 1e-12) / (iters - lo)
