"""Multi-host (multi-process) initialization for SPMD runs.

The reference is strictly single-process (its only multi-device trace
is commented-out ``nn.DataParallel``, ``src/train.py:129-130``). This
framework scales with ``jax.sharding.Mesh`` + jit shardings inside one
process (``parallel/{dp,graph_shard}.py``); on multi-HOST TPU slices
(e.g. v5e-256: 64 hosts x 4 chips) each host must additionally join
the JAX distributed runtime BEFORE first backend use so
``jax.devices()`` spans the whole slice and the mesh code above works
unchanged — collectives then ride ICI within the slice exactly as in
the single-host case.

Wiring is env-gated and a no-op otherwise, so single-host runs (and
every test) are unaffected:

  PRTP_COORDINATOR=host0:9971 PRTP_NUM_PROCESSES=64 PRTP_PROCESS_ID=i \\
      python -m prtp_tpu.train ...

On TPU pods provisioned with standard cluster metadata,
``jax.distributed.initialize()`` auto-detects everything; setting only
``PRTP_MULTIHOST=1`` requests that auto path.
"""

from __future__ import annotations

import os


def maybe_initialize(log=print) -> bool:
    """Join the JAX distributed runtime when the env requests it.

    Returns True when initialization happened. Must be called before
    the first jax backend touch (both CLIs call it right after arg
    parsing). Idempotent: repeated calls return False.
    """
    coord = os.environ.get("PRTP_COORDINATOR")
    auto = os.environ.get("PRTP_MULTIHOST") == "1"
    if not coord and not auto:
        return False
    import jax
    if jax.distributed.is_initialized():  # already joined
        return False
    if coord:
        num = int(os.environ["PRTP_NUM_PROCESSES"])
        pid = int(os.environ["PRTP_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num, process_id=pid)
    else:
        jax.distributed.initialize()
    log(f"jax.distributed: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices")
    return True
