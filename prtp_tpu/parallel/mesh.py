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


def stacked_batch_sharding(mesh: Mesh, ndim: int,
                           axis: str = DP_AXIS) -> NamedSharding:
    """Sharding for a stacked batch: LAST axis on ``dp``, the leading
    (steps / design-group) axes replicated — matches the
    ``(n_steps, B)`` and merged ``(n_steps, K, B)`` layouts of
    :func:`prtp_tpu.trainer.make_scan_train_step` inputs."""
    return NamedSharding(mesh, P(*([None] * (ndim - 1) + [axis])))


def mesh_from_options(options) -> Mesh | None:
    """Resolve the ``--dp`` / ``--mesh_shape`` CLI flags to a Mesh.

    ``--dp`` alone = all visible devices; ``--mesh_shape N`` = the
    first N (an explicit mesh implies ``--dp``). Returns None when
    neither flag is given — the single-device path. A multi-dim
    ``--mesh_shape`` is rejected loudly: the CLI drives 1-D data
    parallelism; the 2-D dp x gp edge sharding is the
    :mod:`prtp_tpu.parallel.graph_shard` library API.
    """
    if not (getattr(options, "dp", False)
            or getattr(options, "mesh_shape", None)):
        return None
    shape = getattr(options, "mesh_shape", None)
    if shape and len(shape) > 1:
        raise ValueError(
            f"--mesh_shape {shape}: the train/test CLIs run a 1-D "
            "data-parallel mesh; for the 2-D (dp, gp) graph-sharded "
            "step use prtp_tpu.parallel.graph_shard directly")
    return make_mesh(shape[0] if shape else None)
