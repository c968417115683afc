from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    get_mesh,
    num_replicas,
    replicate,
    replicated,
    shard_batch,
)
