from qavit_tpu.ckpt.checkpoint import (
    CheckpointManager,
    load_for_transfer,
    restore_train_state,
    retain_checkpoint,
    save_train_state,
)

__all__ = [
    "CheckpointManager", "load_for_transfer", "restore_train_state",
    "retain_checkpoint", "save_train_state",
]
