"""The driver's entry points must work in the driver's own environment.

``dryrun_multichip`` is invoked by the driver in a fresh interpreter whose
JAX may already be initialized on the single tunneled TPU ("axon") device —
it must self-provision the virtual CPU mesh (round-1 failure mode:
MULTICHIP_r01.json rc=1 because make_mesh reshaped 1 device into (2,2,2)).

These tests run the real path in subprocesses with the conftest's CPU
forcing stripped from the environment, so they fail exactly when the
driver would fail.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env() -> dict:
    """Environment as the driver sees it: no conftest CPU forcing."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\S+", "", flags)
    env["XLA_FLAGS"] = flags.strip()
    if not env["XLA_FLAGS"]:
        env.pop("XLA_FLAGS")
    return env


def _run(code: str, timeout: int = 560) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_8_self_provisions():
    """The exact driver invocation: jax pre-initialized, then dryrun(8).

    Covers the 3-axis (dp, sp, tp) mesh branch taken when n % 8 == 0.
    """
    proc = _run(
        "import jax; jax.devices()\n"  # driver may have touched the backend
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "dryrun_multichip OK" in proc.stdout
    assert "'dp': 2, 'sp': 2, 'tp': 2" in proc.stdout


def test_ensure_devices_provisions_virtual_cpu():
    """_ensure_devices flips an initialized backend to an n-device CPU."""
    proc = _run(
        "import jax; jax.devices()\n"
        "import __graft_entry__\n"
        "__graft_entry__._ensure_devices(8)\n"
        "import jax\n"
        "ds = jax.devices()\n"
        "assert len(ds) == 8, ds\n"
        "assert ds[0].platform == 'cpu', ds\n"
        "print('provisioned', len(ds))\n",
        timeout=120,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "provisioned 8" in proc.stdout
