from . import metrics, tee, checkpoint  # noqa: F401
