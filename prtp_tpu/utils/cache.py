"""One shared persistent-XLA-compile-cache location for every entry
point (CLI, bench, driver graft entry).

Round-2 advisor finding: bench.py / scripts/bench_merged.py /
__graft_entry__.py hardcoded /tmp/jax_cache while the CLIs defaulted to
~/.cache/prtp_tpu_xla — two caches, and /tmp is wiped on reboot. All
entry points now share this default; override with the
``PRTP_XLA_CACHE_DIR`` env var (empty string disables).
"""

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "prtp_tpu_xla")


def compile_cache_dir() -> str:
    """The shared cache dir ('' = disabled via PRTP_XLA_CACHE_DIR=)."""
    return os.environ.get("PRTP_XLA_CACHE_DIR", _DEFAULT)


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at the shared dir.

    TPU-only: CPU backends are deliberately never attached to the
    persistent cache. XLA:CPU cache entries are ahead-of-time machine
    code keyed loosely enough that an entry compiled with different host
    CPU features (this container has a remote-compile path) gets loaded
    locally and dies with SIGILL ("Machine type used for XLA:CPU
    compilation doesn't match the machine type for execution") — this
    was the round-2 full-test-suite interpreter crash. CPU compiles are
    fast; only the minutes-long TPU compiles need the cache.
    """
    path = compile_cache_dir() if path is None else path
    if not path:
        return
    import jax
    # Decide WITHOUT forcing backend init: jax.default_backend() would
    # block a CPU-only run (e.g. `train --preprocess`) for minutes when
    # the tunnel-backed TPU plugin is registered but stalled. The
    # intended platform is readable init-free from jax.config (set by
    # conftest/forced-cpu children) or JAX_PLATFORMS (set by the
    # plugin's sitecustomize); only when both are unset do we fall back
    # to asking the backend.
    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS", ""))
    if plats:
        if plats.split(",")[0].strip().lower() == "cpu":
            return
    elif jax.default_backend() == "cpu":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the option
