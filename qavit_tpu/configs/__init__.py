from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.configs.training import TrainingConfig
from qavit_tpu.configs.presets import (
    PRESETS,
    get_preset,
    list_presets,
)

__all__ = [
    "ModelConfig",
    "TrainingConfig",
    "PRESETS",
    "get_preset",
    "list_presets",
]
