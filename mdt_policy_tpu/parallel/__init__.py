from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)
