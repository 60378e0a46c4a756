from . import cache, metrics, tee, checkpoint  # noqa: F401
