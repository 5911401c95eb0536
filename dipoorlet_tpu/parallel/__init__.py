from .mesh import (  # noqa: F401
    data_sharding,
    get_mesh,
    pad_to_multiple,
    reduce_clip_val_collective,
    reduce_clip_val_spmd,
    replicated,
    shard_batch,
)
