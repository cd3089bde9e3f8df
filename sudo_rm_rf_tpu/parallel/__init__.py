from sudo_rm_rf_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    maybe_distributed_initialize,
    replicated_sharding,
    shard_batch,
    tp_param_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "maybe_distributed_initialize",
    "replicated_sharding",
    "shard_batch",
    "tp_param_shardings",
]
