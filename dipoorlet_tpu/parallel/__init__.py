from .mesh import (  # noqa: F401
    batched_data_sharding,
    data_sharding,
    default_data_mesh,
    get_mesh,
    pad_to_multiple,
    reduce_clip_val_collective,
    reduce_clip_val_spmd,
    replicated,
    shard_batch,
)
