from qavit_tpu.data.augment import (AugConfig, augment_batch,
                                    augment_image, eval_batch)
from qavit_tpu.data.datasets import STATS, Dataset, load_dataset
from qavit_tpu.data.loader import BatchLoader
from qavit_tpu.data.pipelines import PIPELINES, PipelineSpec, get_pipeline

__all__ = [
    "AugConfig", "augment_batch", "augment_image", "eval_batch",
    "STATS", "Dataset", "load_dataset",
    "BatchLoader",
    "PIPELINES", "PipelineSpec", "get_pipeline",
]
