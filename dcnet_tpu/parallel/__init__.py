from dcnet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_state, replicated, shard_batch,
)
