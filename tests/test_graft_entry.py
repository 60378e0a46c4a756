"""The driver's multichip dryrun must work from a CLEAN process.

Round-1 failure mode: the driver runs
    python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
with NO XLA_FLAGS and the container-pinned JAX_PLATFORMS=axon (one real
device). dryrun_multichip must bootstrap its own virtual CPU mesh via a
re-exec'd child rather than demanding env vars from the caller.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_from_clean_subprocess():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "axon"  # the container's pinned default
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout


def test_dryrun_multichip_r02_driver_env():
    """EXACT round-2 driver env (MULTICHIP_r02.json failure): the driver
    exports JAX_PLATFORMS=cpu + XLA_FLAGS=--xla_force_host_platform_
    device_count=8, but the axon sitecustomize is still on PYTHONPATH and
    registers the TPU PJRT plugin at interpreter start, so the backend
    does NOT come up as an 8-device CPU mesh on its own. The old fast
    path trusted the env vars and died on `need 8 devices, have 1`;
    dryrun_multichip must now verify the device count (after forcing the
    cpu platform) and fall through to the re-exec'd child on shortfall.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # PYTHONPATH exactly as the container ships it — the axon
    # sitecustomize dir — that's what broke round 2. Pin it explicitly so
    # the scenario holds even when pytest itself runs with PYTHONPATH=.
    if os.path.isdir("/root/.axon_site"):
        env["PYTHONPATH"] = "/root/.axon_site"
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout
    # the 2-D leg must be the segment-reduce path with the in-dryrun
    # numeric equivalence check, not a replicating mailbox no-op
    assert "matches replicated step" in proc.stdout, proc.stdout


def test_dryrun_multichip_in_process():
    # Under pytest the conftest already forced an 8-device CPU platform;
    # the fast path must run the step in-process without re-exec.
    import __graft_entry__ as g

    g.dryrun_multichip(8)
