"""Test config: force an 8-device virtual CPU platform for mesh tests.

Mirrors SURVEY §4's recommendation: real multi-device tests on one host via
XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_fast_math" not in flags:
    # XLA CPU's fast-math exp has ~3e-3 relative error, far worse than the
    # TPU VPU; disable so numeric tests compare against fp32 oracles.
    flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: single-core CPU compiles are the test-suite
# bottleneck; cache survives across pytest runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# The 'axon' TPU plugin ignores the JAX_PLATFORMS env var in this build;
# the config update is what actually pins tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Default matmul precision is reduced (bf16 MXU on TPU; oneDNN fast path on
# CPU) — a (5,32)@(32,24) f32 matmul showed ~3e-2 absolute error vs fp64.
# Force full-precision matmuls for numeric tests (perf runs keep defaults).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
