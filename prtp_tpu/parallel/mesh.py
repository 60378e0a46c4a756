"""Device-mesh construction and sharding helpers.

The reference is single-device (its only multi-GPU trace is
commented-out ``nn.DataParallel``, ``src/train.py:129-130``). Here
multi-chip scaling is first-class: a 1-D ``jax.sharding.Mesh`` over the
slice's chips with the path batch sharded across ICI and everything
else replicated; XLA inserts the ``psum``s for the gradient reduction.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: int | None = None, axis: str = DP_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devices)} "
                f"({jax.default_backend()}); for CPU dry-runs set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "force the cpu platform before first jax use")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DP_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))
