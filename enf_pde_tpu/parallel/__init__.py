from enf_pde_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    shard_train_step,
    sharded_decode,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "shard_train_step",
    "sharded_decode",
]
