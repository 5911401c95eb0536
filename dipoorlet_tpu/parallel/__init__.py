from .mesh import (  # noqa: F401
    data_sharding,
    get_mesh,
    reduce_clip_val_spmd,
    replicated,
    shard_batch,
)
