"""Multi-host init wiring (parallel/distributed.py): env-gated
jax.distributed join. Single-host CI can still validate the wiring by
running a 1-process "cluster" in a clean subprocess (coordinator =
localhost), then checking the mesh/psum path works on the joined
runtime. The reference has no distributed capability at all
(src/train.py:129-130 is commented-out nn.DataParallel); this is an
additive capability of the rebuild."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_maybe_initialize_noop_without_env():
    from prtp_tpu.parallel.distributed import maybe_initialize
    env_backup = {k: os.environ.pop(k, None)
                  for k in ("PRTP_COORDINATOR", "PRTP_MULTIHOST")}
    try:
        assert maybe_initialize() is False
    finally:
        for k, v in env_backup.items():
            if v is not None:
                os.environ[k] = v


def test_one_process_cluster_join():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from prtp_tpu.parallel.distributed import maybe_initialize\n"
        "assert maybe_initialize() is True\n"
        "assert maybe_initialize() is False  # idempotent\n"
        "assert jax.process_count() == 1\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from prtp_tpu.parallel import make_mesh, make_dp_train_step\n"
        "devs = jax.devices()\n"
        "mesh = make_mesh(len(devs))\n"
        "from jax.sharding import NamedSharding, PartitionSpec as P\n"
        "x = jax.device_put(np.arange(len(devs) * 2, dtype=np.float32),\n"
        "                   NamedSharding(mesh, P('dp')))\n"
        "from jax.experimental.shard_map import shard_map\n"
        "f = shard_map(lambda v: jax.lax.psum(v.sum(), 'dp'), mesh,\n"
        "              in_specs=P('dp'), out_specs=P())\n"
        "total = float(jax.jit(f)(x))\n"
        "assert total == float(np.arange(len(devs) * 2).sum()), total\n"
        "print('DIST OK', len(devs))\n"
    )
    env = dict(os.environ)
    env.update(
        PRTP_COORDINATOR=f"127.0.0.1:{port}",
        PRTP_NUM_PROCESSES="1",
        PRTP_PROCESS_ID="0",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=REPO,
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DIST OK" in proc.stdout
