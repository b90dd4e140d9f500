from .mesh import create_mesh, data_sharding  # noqa: F401
from .data_parallel import make_sharded_train_step, shard_batch  # noqa: F401
from .particle_sharding import (  # noqa: F401
    make_particle_sharded_pf_loop,
    make_particle_sharded_pf_train_loop,
)
from .temporal_pipeline import (  # noqa: F401
    make_pipelined_filter_loop,
    make_pipelined_pf_loop,
)
