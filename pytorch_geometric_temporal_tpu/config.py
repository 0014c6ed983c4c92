"""Global configuration for backend selection.

TPU-first design note: on TPU the MXU (128x128 systolic array) makes a dense
``A @ X`` the fastest aggregation path for small/medium graphs (the entire
adjacency fits in VMEM and the op is a single fused matmul), while scatter/
segment ops run on the much slower VPU + relayouts.  We therefore pick the
aggregation backend per-graph:

- ``dense``   : materialize the (N, N) adjacency once per jit trace and use
                matmuls.  Default for ``num_nodes <= dense_threshold``.
- ``segment`` : gather + ``segment_sum``.  Portable reference path; used for
                large graphs and on CPU.
- ``pallas``  : hybrid block-sparse SpMM for large graphs on TPU — dense
                128x128 BCSR tiles on the MXU via a Pallas kernel, with
                edges from sub-threshold blocks spilled to a COO remainder
                (see ``ops/bcsr.py``).

The reference framework (PyTorch Geometric Temporal) always uses scatter-based
message passing (torch_geometric MessagePassing.propagate); this module is the
TPU-native replacement for that choice.
"""

from __future__ import annotations

import contextlib
import dataclasses


@dataclasses.dataclass
class Config:
    # Graphs with at most this many nodes use the dense MXU path by default.
    dense_threshold: int = 4096
    # 'auto' | 'dense' | 'segment' | 'pallas'
    spmm_backend: str = "auto"
    # Node reordering for auto-built BCSR operators: 'auto' runs the
    # shortcut-filtered RCM pass and keeps it only when the kernel cost
    # model says it wins (ops/bcsr.py: _reorder_pays_off); 'off' preserves
    # caller ordering.  One-time host cost ~1-3 s at 2M edges, cached per
    # Graph; measured 27x kernel speedup when caller node ids scramble a
    # structurally-local graph (benchmarks/reorder_sweep.py).
    spmm_reorder: str = "auto"
    # matmul accumulation dtype
    use_bfloat16_matmul: bool = False


_config = Config()


def get_config() -> Config:
    return _config


@contextlib.contextmanager
def config_override(**kwargs):
    """Temporarily override config fields (e.g. spmm_backend='segment')."""
    global _config
    old = dataclasses.replace(_config)
    for k, v in kwargs.items():
        if not hasattr(_config, k):
            raise ValueError(f"unknown config field {k!r}")
        setattr(_config, k, v)
    try:
        yield _config
    finally:
        _config = old
