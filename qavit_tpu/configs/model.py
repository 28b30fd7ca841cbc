"""Model configuration for the QA-ViT / HQA-ViT family.

One config dataclass covers every model variant in the reference matrix
(reference: QAViT.py:37, QAViTV2_EXTREME.py:41, HQAViT_CIFAR100.py:43,
HQAViT_IN_Tiny.py:49, HQAViTv2_CIFAR100.py — see SURVEY.md §2.8).  Variant
differences are expressed as explicit feature flags instead of per-script
code copies.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


@dataclass(frozen=True)
class BankConfig:
    """Global token bank behaviour.

    The reference has two generations of the bank update rule:

    * v1 (QAViT.py:183): update rate 0.01, per-update clamp +-0.1,
      post-update clamp +-1.0, no warmup counter.
    * v2 (QAViTV2_EXTREME.py:486, HQAViT_CIFAR100.py:275): update clamp
      +-0.05, rate 0.005 for the first 1000 writes then 0.01, post-update
      clamp +-0.5, persistent ``update_count``.
    """

    size: int = 16
    update_clamp: float = 0.05
    update_rate_warm: float = 0.005
    update_rate: float = 0.01
    warmup_writes: int = 1000
    value_clamp: float = 0.5


BANK_V1 = BankConfig(
    update_clamp=0.1,
    update_rate_warm=0.01,
    update_rate=0.01,
    warmup_writes=0,
    value_clamp=1.0,
)


@dataclass(frozen=True)
class ModelConfig:
    """Hyper-parameters for QAViT / HQAViT models.

    Field defaults follow the HQA-ViT CIFAR-100 flagship preset
    (HQAViT_CIFAR100.py:43-78).
    """

    name: str = "hqavit_c100"

    # Input / output
    img_size: int = 32
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 100

    # Transformer trunk
    embed_dim: int = 192
    depth: int = 8
    num_heads: int = 4
    compress_ratio: int = 4          # branch compression d -> d/4
    bottleneck_ratio: int = 2        # bottleneck MLP hidden = d/2
    mlp_ratio: float = 0.5           # CCF-FFN hidden = d/2
    dropout: float = 0.1
    drop_path: float = 0.1

    # Branch geometry
    window_size: int = 4
    dilation_factors: Tuple[int, ...] = (1, 2)
    landmark_pooling_stride: int = 2
    msda_pad_len: int = 128          # MSDA pads pooled K/V to this length
    num_channel_groups: int = 6
    linformer_k: int = 32

    # Global token bank
    bank: BankConfig = field(default_factory=BankConfig)

    # Variant flags (v1 = QAViT.py, v2 = stabilised QAViTv2 / HQAViT)
    stabilized_dwconv: bool = True   # kaiming/sqrt(dim) init, 0.1 scale
    stabilized_ccfffn: bool = True   # LN around dwconv + learnable gamma 0.1
    # QAViTv2.py:861 keeps bias=True in its stabilised dwconv ("Add bias
    # for stability"); the later 32px v2 files drop it (bias=False,
    # QAViTv2_CIFAR100.py:885).  Only the qavit_v2 224 preset sets True.
    dwconv_bias: bool = False

    # --- HQA hybrid side path (absent in plain QAViT presets) ---
    hybrid: bool = True
    cnn_c2: int = 64
    cnn_c3: int = 128
    cnn_c4: int = 256
    stem_kind: str = "v1"            # "v1" (conv+BN stem) | "convnext" (v2 patchify)
    rrcv_channels: int = 64
    rrcv_num_blocks: int = 1
    use_token_learner: bool = True
    num_learned_tokens: int = 16
    # number of blocks per stage; SplitFusion with F2/F3/F4 injected before
    # stages 2/3/4.  Reference CIFAR code is [2,2,2,2] despite its comments
    # claiming [2,2,4,2] (HQAViT_CIFAR100.py:1189-1207 uses ranges
    # 0:2/2:4/4:6/6:8) — we follow the code.
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)

    # Compute precision: "bfloat16" activations / fp32 params is the TPU
    # replacement for the reference's CUDA autocast (HQAViT_CIFAR100.py:1401).
    dtype: str = "bfloat16"

    # NaN/Inf guard in the attention wrapper (zeroes the output when inputs
    # or outputs contain NaN), matching efficient_attention QAViT.py:259-291.
    guard_nans: bool = True
    # attention kernel: "auto" (shape-based dispatch) | "xla" | "pallas"
    attn_impl: str = "auto"
    # rematerialise each block in the backward pass: trades recompute for
    # HBM activation traffic/memory (jax.checkpoint over the scanned body).
    # Measured +25% train throughput on the flagship (HBM-traffic bound).
    remat: bool = True

    def __post_init__(self):
        if self.embed_dim % self.num_heads:
            raise ValueError("embed_dim must divide num_heads")
        if self.hybrid and sum(self.stage_blocks) != self.depth:
            raise ValueError(
                f"stage_blocks {self.stage_blocks} must sum to depth {self.depth}"
            )
        if self.embed_dim % self.num_channel_groups:
            raise ValueError("embed_dim must divide num_channel_groups")

    # Derived quantities -------------------------------------------------
    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        d = dict(d)
        if isinstance(d.get("bank"), dict):
            d["bank"] = BankConfig(**d["bank"])
        for k in ("dilation_factors", "stage_blocks"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**d)
