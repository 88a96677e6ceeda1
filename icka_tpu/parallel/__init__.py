from icka_tpu.parallel.partitioning import (
    param_partition_specs,
    shard_params,
    shard_train_state,
)

__all__ = ["param_partition_specs", "shard_params", "shard_train_state"]
