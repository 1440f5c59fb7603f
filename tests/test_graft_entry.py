"""Regression tests for the driver-facing ``__graft_entry__`` module.

The round-1 driver artifact (MULTICHIP_r01.json) failed because
``dryrun_multichip`` asserted on pre-existing devices instead of
provisioning the virtual CPU mesh itself.  These tests invoke the entry
points exactly the way the driver does: a cold ``python -c`` subprocess
with no XLA/JAX env vars set, on a host that does not have 8 chips.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cold_env():
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO_ROOT
    return env


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_cold():
    """The driver invokes dryrun_multichip cold; it must force the
    n-device virtual CPU platform itself (round contract)."""
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO_ROOT,
        env=_cold_env(),
        capture_output=True,
        text=True,
        # generous: the cold 8-virtual-device compile shares ONE host
        # core with whatever else runs (concurrent TPU benchmarks were
        # measured to push it past 15 min; the collective rendezvous
        # timeouts are raised for the same reason, conftest.py)
        timeout=2400,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "ok" in proc.stdout


def test_provision_devices_in_process():
    """In-process (conftest already provisioned 8 CPU devices): the
    helper must be a no-op pass-through, not fail or re-pin."""
    import __graft_entry__ as g

    jax = g._provision_devices(8)
    assert len(jax.devices()) >= 8
