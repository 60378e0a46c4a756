from .mesh import make_mesh, replicated, batch_sharding  # noqa: F401
from .dp import make_dp_train_step, make_dp_eval_step, shard_batch  # noqa: F401
from .distributed import maybe_initialize  # noqa: F401
