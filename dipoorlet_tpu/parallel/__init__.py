from .mesh import (  # noqa: F401
    allreduce_sum_arrays,
    assert_rank_identical,
    batched_data_sharding,
    data_sharding,
    default_data_mesh,
    get_mesh,
    global_data_mesh,
    pad_to_multiple,
    reduce_clip_val_collective,
    replicated,
    shard_batch,
)
