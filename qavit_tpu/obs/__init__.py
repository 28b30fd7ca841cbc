from qavit_tpu.obs.analyzer import (
    analytic_flops,
    batch_size_sweep,
    benchmark_fn,
    device_memory_stats,
    param_breakdown,
    print_analysis,
)
from qavit_tpu.obs.metrics import TrainingLogger
from qavit_tpu.obs.monitor import GradientMonitor, check_for_nan, grad_stats

__all__ = [
    "analytic_flops", "batch_size_sweep", "benchmark_fn",
    "device_memory_stats", "param_breakdown", "print_analysis",
    "TrainingLogger", "GradientMonitor", "check_for_nan", "grad_stats",
]
