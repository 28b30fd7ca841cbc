"""Training configuration.

Mirrors the reference's per-script TrainingConfig dataclasses
(HQAViT_CIFAR100.py:81-123, QAViT.py:59-94, HQAViT_C100_Finetune.py,
HQAViT_Tiny_Cifar10.py) as one parameterised config.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class TrainingConfig:
    # Batching
    batch_size: int = 256            # global batch (sharded over the mesh)
    eval_batch_size: Optional[int] = None  # default: 2x train batch

    # Schedule
    epochs: int = 450
    warmup_epochs: int = 20
    base_lr: float = 6e-4
    min_lr: float = 5e-6
    weight_decay: float = 0.06
    # "onecycle" (pretrain, QAViT.py:896) | "cosine" | "warm_restarts"
    # (finetune, HQAViT_C100_Finetune.py:435)
    schedule: str = "onecycle"
    onecycle_div_factor: float = 25.0
    onecycle_final_div: float = 1e4
    warm_restart_t0_epochs: int = 10
    warm_restart_t_mult: int = 2

    # Regularisation
    label_smoothing: float = 0.12
    use_mixup: bool = True
    mixup_alpha: float = 0.9
    use_cutmix: bool = True
    cutmix_alpha: float = 1.0
    mix_prob: float = 0.6
    # EXTREME-style single-draw split (QAViTV2_EXTREME.py:1279): one uniform
    # draw routed to mixup w.p. mixup_prob and cutmix w.p. cutmix_prob.
    # HQA-style (default, HQAViT_CIFAR100.py:1381): try cutmix first
    # w.p. mix_prob, then mixup w.p. mix_prob.
    mix_style: str = "hqa"           # "hqa" | "extreme"
    mixup_prob: float = 0.8          # only for mix_style == "extreme"
    cutmix_prob: float = 0.2

    # Gradient accumulation (HQAViT_CIFAR100.py:85, :1405-1412; reference
    # default 1).  k>1 splits each batch into k scanned micro-batches with
    # one clipped optimizer/EMA update on the averaged gradients.
    gradient_accumulation_steps: int = 1

    # Flattened-parameter AdamW+clip+EMA (qavit_tpu/train/flat_optim.py):
    # same math as the per-leaf chain, issued as a few big vector ops
    # instead of ~1500 tiny fused loops over 487 leaves.  Equivalence is
    # tested; resume requires the same setting the checkpoint was written
    # with (the optimizer-state layout differs).
    flat_optimizer: bool = False

    # Gradient control (HQAViT_CIFAR100.py:97, :1415-1434)
    max_grad_norm: float = 0.5
    grad_clip_mode: str = "norm"     # "norm" | "value"
    # per-subtree pre-clip of cnn_stem / dwconv params to this norm before
    # the global clip (HQAViT_CIFAR100.py:1416-1418); None disables.
    subtree_clip_norm: Optional[float] = 0.1
    subtree_clip_keys: Tuple[str, ...] = ("cnn_stem", "dwconv")

    # EMA (HQAViT_CIFAR100.py:109-113, :1634-1638)
    use_ema: bool = True
    ema_decay: float = 0.999
    ema_decay_warmup: float = 0.99

    # Layer-wise LR for finetuning (HQAViT_C100_Finetune.py:188-227).
    # None = single LR.  "layerwise" = head x mult, stage decay, fusion x0.5,
    # cnn_stem x0.1, embeddings x0.3.  "differential" = backbone vs head
    # (HQAViT_Tiny_Cifar10.py:327).
    lr_groups: Optional[str] = None
    head_lr_multiplier: float = 5.0
    layer_lr_decay: float = 0.8

    # Monitoring / checkpointing cadence
    # per-step parameter-norm metric (GradientMonitor parity) costs ~700
    # extra reductions per step — off by default, enable for debugging
    log_param_norm: bool = False
    print_freq: int = 50
    eval_freq: int = 1
    save_freq: int = 10

    # Paths
    data_root: str = "./data"
    checkpoint_dir: str = "./checkpoints"
    log_dir: str = "./logs"

    # Misc
    seed: int = 42
    # Donate the TrainState buffers to the jitted step.  Off by default:
    # the axon remote-TPU backend deadlocks on donated buffers (verified
    # empirically); enable on directly-attached TPUs for in-place updates.
    donate: bool = False

    def replace(self, **kw) -> "TrainingConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainingConfig":
        d = dict(d)
        if "subtree_clip_keys" in d and isinstance(d["subtree_clip_keys"], list):
            d["subtree_clip_keys"] = tuple(d["subtree_clip_keys"])
        return cls(**d)
