"""Shared test fixtures.

Tests run on CPU with 8 virtual XLA devices so that every pjit/sharding
path (the v5e-8-shaped mesh) is exercised without TPU hardware — set up
before JAX is first imported anywhere in the test process.
"""

import os
import sys
import types

# Must happen before any `import jax` in the test session.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Keep tests hermetic: CLI mains invoked in-process enable the repo's
# persistent XLA compile cache (utils/platform.py), and a pytest process
# sharing .jax_cache with a concurrent full-size benchmark/probe can
# read a torn entry (observed: zstd abort inside
# compilation_cache.get_executable_and_time).  Tiny CPU graphs don't
# need the cache anyway.
os.environ.setdefault("MRAUDIO_COMPILE_CACHE", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in _flags:
    # 8 virtual-device collectives need all 8 XLA:CPU threads at each
    # rendezvous within the termination timeout (default 40 s) or the
    # PROCESS aborts; on this 1-core host a concurrent benchmark can
    # starve a thread past that under load.  Raise both timeouts.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = _flags

# The axon TPU plugin ignores the JAX_PLATFORMS env var; only the config
# option reliably pins tests to the virtual 8-device CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module.

    The full suite runs ~600 XLA:CPU compiles in one process; letting
    every jitted executable live for the whole session accumulates LLVM
    JIT code mappings until the process segfaults inside
    ``backend_compile_and_load`` at ~80% of the suite (observed twice,
    at two different tests — a cumulative limit, not a test bug).
    Modules rarely share compiled graphs, so the re-compile cost is
    noise next to the crash."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def reference():
    """Import reference (upstream) modules as a golden oracle.

    The reference's pure-Python metric/parsing layers run fine on CPU;
    we compare our implementations against them directly instead of
    hand-maintaining golden files.  Missing heavy deps (wandb) are
    stubbed.  Skips if the reference checkout is absent.
    """
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "wandb" not in sys.modules:
        wandb_stub = types.ModuleType("wandb")
        wandb_stub.Table = object
        wandb_stub.Image = object
        sys.modules["wandb"] = wandb_stub

    import importlib

    ref = types.SimpleNamespace()
    ref.mr_utils = importlib.import_module("eval.mr_utils")
    ref.mr_eval = importlib.import_module("eval.mr_eval")
    ref.utils = importlib.import_module("utils.utils")
    return ref


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
