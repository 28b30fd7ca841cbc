"""qavit-tpu: a TPU-native (JAX / XLA / Pallas) framework for the QA-ViT /
HQA-ViT model family.

A ground-up rebuild of the capabilities of the QA-ViT research stack
(reference: cujoramirez/QA-ViT) as one de-duplicated, functional, TPU-first
library:

- ``qavit_tpu.configs``  — experiment presets (QAViT v1/v2/EXTREME, HQAViT
  CIFAR-100 / v2 / Tiny-ImageNet, finetune + transfer presets).
- ``qavit_tpu.nn``       — pure flax modules: the four attention branches,
  global token bank (explicit functional state), Linformer compression,
  CCF-FFN, hybrid CNN stem / LMFA / RRCV / SplitFusion / TokenLearner, models.
- ``qavit_tpu.kernels``  — Pallas TPU kernels (fused attention) + XLA
  reference implementations.
- ``qavit_tpu.train``    — optax-based training engine: AdamW + OneCycle /
  cosine schedules, per-subtree + global clipping, EMA, mixup/cutmix,
  jit'd train/eval steps in bf16.
- ``qavit_tpu.parallel`` — device mesh + shard_map data-parallel step.
- ``qavit_tpu.data``     — host-side dataset sources + device-side (in-jit)
  augmentation (random crop, flip, RandAugment, color jitter, erasing).
- ``qavit_tpu.ckpt``     — orbax checkpointing with true step-level resume.
- ``qavit_tpu.eval``     — top-1/top-5, confusion matrices, per-class
  reports, TTA ensembling.
- ``qavit_tpu.interpret``— Grad-CAM and attention rollout.
- ``qavit_tpu.obs``      — metrics JSON (training_metrics.json schema),
  gradient monitor, architecture analyzer, plots, profiler glue.
"""

__version__ = "0.1.0"

import os as _os

# The fused-block Pallas kernels keep a whole batch tile's working set in
# VMEM (~74 MB for the largest backward at tile 64).  Their per-kernel
# vmem_limit_bytes override is honoured for standalone calls, but under
# deep remat/scan/while nesting XLA's own scoped-vmem check falls back to
# its 16 MiB default — raise it process-wide BEFORE backend init.
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=102400"
if "xla_tpu_scoped_vmem_limit_kib" not in _os.environ.get(
        "LIBTPU_INIT_ARGS", ""):
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
    ).strip()
