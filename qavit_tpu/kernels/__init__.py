from qavit_tpu.kernels.attention import attention, xla_attention
from qavit_tpu.kernels.flash_attention import flash_attention

__all__ = ["attention", "xla_attention", "flash_attention"]
