from .mesh import make_mesh
from .sharding import (
    param_pspecs,
    cache_pspec,
    shard_params,
    shard_cache,
    KIND_PSPECS,
)
from .tp import make_sharded_forward
