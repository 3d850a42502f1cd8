from studiosr_tpu.parallel.dist import initialize, is_main_process, local_device_count, process_count, process_index
from studiosr_tpu.parallel.mesh import P, data_sharding, get_mesh, replicate, replicate_sharding, shard_batch
from studiosr_tpu.parallel.train_step import (
    TrainState,
    build_optimizer,
    make_train_step,
    multistep_schedule,
    prepare_state,
)

__all__ = [
    "initialize",
    "is_main_process",
    "local_device_count",
    "process_count",
    "process_index",
    "P",
    "data_sharding",
    "get_mesh",
    "replicate",
    "replicate_sharding",
    "shard_batch",
    "TrainState",
    "build_optimizer",
    "make_train_step",
    "multistep_schedule",
    "prepare_state",
]
