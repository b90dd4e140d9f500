from .mesh import create_mesh, data_sharding  # noqa: F401
from .data_parallel import make_sharded_train_step, shard_batch  # noqa: F401
