from vision_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from vision_tpu.parallel.sharding import (
    infer_fsdp_sharding,
    infer_tp_sharding,
    param_shardings,
    shard_params,
)
from vision_tpu.parallel.train import TrainState, make_train_step, reduce_across_devices

__all__ = [
    "TrainState",
    "infer_fsdp_sharding",
    "infer_tp_sharding",
    "param_shardings",
    "shard_params",
    "make_mesh",
    "make_train_step",
    "reduce_across_devices",
    "replicate",
    "shard_batch",
]
