from qavit_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from qavit_tpu.parallel.dp import (
    make_dp_eval_step,
    make_gspmd_train_chunk,
    make_gspmd_train_step,
    make_shardmap_train_step,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "init_distributed",
    "make_mesh", "replicated", "shard_batch",
    "make_dp_eval_step", "make_gspmd_train_chunk", "make_gspmd_train_step",
    "make_shardmap_train_step",
]
