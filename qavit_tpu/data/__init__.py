from qavit_tpu.data.augment import (AugConfig, augment_batch,
                                    augment_image, eval_batch)
from qavit_tpu.data.datasets import STATS, Dataset, load_dataset
from qavit_tpu.data.loader import BatchLoader, IndexLoader
from qavit_tpu.data.pipelines import PIPELINES, PipelineSpec, get_pipeline

__all__ = [
    "AugConfig", "augment_batch", "augment_image", "eval_batch",
    "STATS", "Dataset", "load_dataset",
    "BatchLoader",
    "IndexLoader",
    "PIPELINES", "PipelineSpec", "get_pipeline",
]
