"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(jax.sharding.Mesh + shard_map) are exercised without TPU hardware.

Note: this environment registers a TPU PJRT plugin from sitecustomize
and pins JAX_PLATFORMS=axon, so the env var alone is not enough — we
must also override via jax.config before any backend is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
