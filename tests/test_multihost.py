"""Two coordinated processes = a real multi-HOST run, on CPU.

`parallel/distributed.py` wires `jax.distributed.initialize`; rounds
2-3 only exercised it with a 1-process cluster. This spawns TWO
coordinated CPU processes (2 virtual devices each), drives the same
env-gated `maybe_initialize` the CLIs call, and runs one dp train step
over the GLOBAL 4-device mesh in each process. Asserts: both processes
see the global mesh (device_count=4), produce IDENTICAL losses and
parameter checksums (the grad psum crossed the process boundary), and
match a single-process 4-device reference run of the same step.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "_multihost_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _child_env():
    # clean env: no axon-plugin sitecustomize on PYTHONPATH (a stalled
    # tunnel must not block the CPU-only children), no conftest jax
    # config (fresh interpreters)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    return env


def _parse(line):
    m = re.search(r"RESULT pid=(\d+) nproc=(\d+) ndev=(\d+) "
                  r"loss=([-\d.]+) checksum=([-\d.]+)", line)
    assert m, f"no RESULT line in: {line!r}"
    return (int(m.group(2)), int(m.group(3)),
            float(m.group(4)), float(m.group(5)))


def test_two_process_dp_step_identical():
    port = _free_port()
    env = _child_env()
    procs = [subprocess.Popen(
        [sys.executable, CHILD, str(pid), str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=REPO)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host child timed out (coordination hang)")
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())

    results = [_parse(o) for o in outs]
    for nproc, ndev, _loss, _ck in results:
        assert nproc == 2 and ndev == 4, results
    # identical across processes: the psum'd update is replica-identical
    assert results[0][2] == results[1][2], f"loss differs: {results}"
    assert results[0][3] == results[1][3], f"params differ: {results}"

    # single-process 4-device run of the same step: the 2-process
    # cluster must compute the same numbers (the process boundary is an
    # implementation detail of the mesh)
    ref = subprocess.run([sys.executable, CHILD, "ref"], env=_child_env(),
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         timeout=420, cwd=REPO)
    assert ref.returncode == 0, ref.stderr.decode()[-2000:]
    _, _, ref_loss, ref_ck = _parse(ref.stdout.decode())
    np.testing.assert_allclose(results[0][2], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0][3], ref_ck, rtol=1e-6)
