"""Test harness: force a virtual 8-device CPU platform before JAX import.

Mirrors the reference's absent test story with a real one (SURVEY.md §4):
mesh/sharding tests run on `--xla_force_host_platform_device_count=8` so
multi-chip logic is exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored when the axon PJRT plugin is present; the
# config update is, and keeps tests off the (single-tenant) TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches_between_modules():
    """Free compiled executables at each module boundary. The full suite
    accumulates hundreds of XLA:CPU executables in one process; past
    ~330 tests the NEXT compile segfaults inside backend_compile_and_load
    (reproduced twice at the identical test, 2026-08-19) — an XLA-CPU
    JIT code-cache exhaustion, not a model bug (the crashing module
    passes standalone). Cross-module executable reuse is minimal, so the
    recompile cost is noise next to suite stability."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
