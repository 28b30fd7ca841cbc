from qavit_tpu.train.mix import MixedBatch, apply_mix, mixed_loss, smoothed_cross_entropy
from qavit_tpu.train.optim import make_optimizer, make_schedule
from qavit_tpu.train.state import (
    TrainState,
    create_train_state,
    ema_distance,
    ema_update,
    ema_warmup_decay,
    param_count,
    swap_bank,
)
from qavit_tpu.train.steps import make_eval_step, make_train_step

__all__ = [
    "MixedBatch", "apply_mix", "mixed_loss", "smoothed_cross_entropy",
    "make_optimizer", "make_schedule",
    "TrainState", "create_train_state", "ema_distance", "ema_update",
    "ema_warmup_decay", "param_count", "swap_bank",
    "make_eval_step", "make_train_step",
]
