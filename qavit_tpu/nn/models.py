"""QA-ViT model family: QAViT (flat trunk) and HQAViT (hybrid staged trunk).

Rebuilds QAViT (QAViT.py:654-699) and HQAViT (HQAViT_CIFAR100.py:1141-1277)
as functional flax models.  Forward signature for both:

    logits, bank_state = model.apply(
        {"params": params, **extra}, images, train=..., bank_count=...,
        rngs={"dropout": rng}, mutable=[...])

* ``images`` are NHWC, normalised float.
* ``bank_state`` is the post-forward global-token-bank carry; the train
  step persists it into the params (see qavit_tpu/train/state.py).
* the v1 CNN stem carries BatchNorm ``batch_stats`` as a flax collection.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.nn.bank import BankState, GlobalTokenBank
from qavit_tpu.nn.block import QuadAttentionBlock, QuadBlockWithTokenLearner
from qavit_tpu.nn.hybrid import (
    CNNStemConvNeXt,
    CNNStemV1,
    LMFAdapter,
    RRCV,
    SplitFusion,
)
from qavit_tpu.nn.layers import LN_EPS, PatchEmbed, dense_init


def _dtype_of(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _drop_path_rates(cfg: ModelConfig):
    return list(np.linspace(0.0, cfg.drop_path, cfg.depth))


class QAViT(nn.Module):
    """Flat Quad-Attention ViT (QAViT.py:654-699)."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None

    def setup(self):
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim,
                                      dtype=dtype)
        self.pos_embed = self.param("pos_embed",
                                    nn.initializers.normal(0.02),
                                    (1, cfg.num_patches, cfg.embed_dim))
        self.pos_drop = nn.Dropout(cfg.dropout)
        self.global_bank = GlobalTokenBank(cfg.bank, cfg.embed_dim,
                                           dtype=dtype,
                                           pmean_axis=self.pmean_axis)
        dpr = _drop_path_rates(cfg)
        self.blocks = [
            QuadAttentionBlock(cfg, self.global_bank, dpr[i], dtype=dtype,
                               name=f"block{i}")
            for i in range(cfg.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype)
        self.head = nn.Dense(cfg.num_classes, dtype=dtype,
                             kernel_init=dense_init)

    def __call__(self, x, train: bool = False,
                 bank_count=0) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        t = self.patch_embed(x.astype(dtype))
        t = t + self.pos_embed.astype(dtype)
        t = self.pos_drop(t, deterministic=not train)

        state = self.global_bank.init_state(bank_count)
        for block in self.blocks:
            t, state = block(t, state, train)

        t = self.norm(t)
        pooled = t.mean(axis=1)
        logits = self.head(pooled).astype(jnp.float32)
        return logits, state


class HQAViT(nn.Module):
    """Hybrid Quad-Attention ViT: CNN lateral stem + LMFA/RRCV/SplitFusion
    injected between transformer stages (HQAViT_CIFAR100.py:1141-1277)."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None

    def setup(self):
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        hw = cfg.grid_size

        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim,
                                      dtype=dtype)
        self.pos_embed = self.param("pos_embed",
                                    nn.initializers.normal(0.02),
                                    (1, cfg.num_patches, cfg.embed_dim))
        self.pos_drop = nn.Dropout(cfg.dropout)
        self.global_bank = GlobalTokenBank(cfg.bank, cfg.embed_dim,
                                           dtype=dtype,
                                           pmean_axis=self.pmean_axis)

        stem_cls = CNNStemV1 if cfg.stem_kind == "v1" else CNNStemConvNeXt
        self.cnn_stem = stem_cls(cfg.cnn_c2, cfg.cnn_c3, cfg.cnn_c4,
                                 dtype=dtype)
        self.lmfa2 = LMFAdapter(cfg.embed_dim, hw, dtype=dtype)
        self.lmfa3 = LMFAdapter(cfg.embed_dim, hw, dtype=dtype)
        self.lmfa4 = LMFAdapter(cfg.embed_dim, hw, dtype=dtype)
        self.rrcv2 = RRCV(cfg.embed_dim, cfg.rrcv_channels,
                          cfg.rrcv_num_blocks, dtype=dtype)
        self.rrcv3 = RRCV(cfg.embed_dim, cfg.rrcv_channels,
                          cfg.rrcv_num_blocks, dtype=dtype)
        self.rrcv4 = RRCV(cfg.embed_dim, cfg.rrcv_channels,
                          cfg.rrcv_num_blocks, dtype=dtype)
        self.fuse2 = SplitFusion(cfg.embed_dim, cfg.dropout, dtype=dtype)
        self.fuse3 = SplitFusion(cfg.embed_dim, cfg.dropout, dtype=dtype)
        self.fuse4 = SplitFusion(cfg.embed_dim, cfg.dropout, dtype=dtype)

        dpr = _drop_path_rates(cfg)
        stages = []
        idx = 0
        for s, nblocks in enumerate(cfg.stage_blocks, start=1):
            stages.append([
                QuadBlockWithTokenLearner(cfg, self.global_bank, dpr[idx + i],
                                          dtype=dtype,
                                          name=f"stage{s}_block{i}")
                for i in range(nblocks)
            ])
            idx += nblocks
        self.stages = stages

        self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype)
        self.head = nn.Dense(cfg.num_classes, dtype=dtype,
                             kernel_init=dense_init)

    def __call__(self, x, train: bool = False,
                 bank_count=0) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        hw = cfg.grid_size
        x = x.astype(dtype)

        # lateral CNN path
        f2, f3, f4 = self.cnn_stem(x, train)
        r2 = self.rrcv2(self.lmfa2(f2), (hw, hw), train)
        r3 = self.rrcv3(self.lmfa3(f3), (hw, hw), train)
        r4 = self.rrcv4(self.lmfa4(f4), (hw, hw), train)

        # ViT path
        t = self.patch_embed(x)
        t = t + self.pos_embed.astype(dtype)
        t = self.pos_drop(t, deterministic=not train)

        state = self.global_bank.init_state(bank_count)
        laterals = [None, r2, r3, r4]
        fusions = [None, self.fuse2, self.fuse3, self.fuse4]
        for stage_idx, blocks in enumerate(self.stages):
            if stage_idx > 0 and stage_idx < len(laterals):
                t = fusions[stage_idx](t, laterals[stage_idx], train)
            for block in blocks:
                t, state = block(t, state, train)

        t = self.norm(t)
        pooled = t.mean(axis=1)
        logits = self.head(pooled).astype(jnp.float32)
        return logits, state


def build_model(cfg: ModelConfig, pmean_axis: Optional[str] = None):
    """Model factory (replaces the reference's broken ``qavit_tiny``
    factories, compile_model.py:14 / verify_gpu.py:62)."""
    cls = HQAViT if cfg.hybrid else QAViT
    return cls(cfg, pmean_axis=pmean_axis)


def init_model(cfg: ModelConfig, rng: jax.Array, batch_size: int = 2,
               pmean_axis: Optional[str] = None):
    """Initialise model variables with a dummy batch.

    Returns (model, variables).  ``variables`` contains 'params' and, for
    v1 hybrid stems, 'batch_stats'.
    """
    model = build_model(cfg, pmean_axis)
    dummy = jnp.zeros((batch_size, cfg.img_size, cfg.img_size,
                       cfg.in_channels), jnp.float32)
    params_rng, dropout_rng = jax.random.split(rng)
    # init with train=True so the (train-only) bank write path creates its
    # parameters too
    variables = model.init({"params": params_rng, "dropout": dropout_rng},
                           dummy, train=True)
    return model, variables
