"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors the reference's CPU-only CI strategy
(/root/reference/.github/workflows/main.yml:30-38) while additionally giving
us an 8-device virtual mesh so multi-chip sharding (data parallel, node
partitioning with halo exchange) is exercised on every test run.

Note: this environment may auto-register a remote TPU platform ("axon") via
sitecustomize at interpreter start; jax may therefore already be imported
when this file runs.  Backend *initialization* is lazy, so updating
jax.config and the env here (before any jax op executes) still pins tests to
the 8-device virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# This jax build's default matmul precision truncates f32 operands to
# bf16-like mantissas even on CPU (measured ~7e-2 abs error on a 64x64
# matmul vs numpy).  Correctness tests compare against f64 torch/numpy
# oracles, so pin full precision; production TPU runs keep the fast default.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
