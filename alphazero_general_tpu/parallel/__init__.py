from alphazero_general_tpu.parallel.mesh import (  # noqa: F401
    BATCH_AXIS,
    batch_sharding,
    host_local_to_global,
    init_distributed,
    make_mesh,
    make_sharded_play_chunk,
    make_sharded_train_step,
    replicate_tree,
    replicated,
    shard_leading_axis,
    shard_selfplay_carry,
    usable_devices,
)
