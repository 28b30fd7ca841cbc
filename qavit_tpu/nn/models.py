"""QA-ViT model family: QAViT (flat trunk) and HQAViT (hybrid staged trunk).

Rebuilds QAViT (QAViT.py:654-699) and HQAViT (HQAViT_CIFAR100.py:1141-1277)
as functional flax models.  The block stack is an ``nn.scan`` — each stage
compiles to one XLA while-loop body with stacked parameters (leading axis =
depth) instead of the reference's N inlined module copies; per-depth
drop-path rates ride along as the scanned input.

Forward signature for both models:

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
from qavit_tpu.nn.bank import BankState, GlobalBankParams, bank_init_state
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


def _drop_path_rates(cfg: ModelConfig) -> np.ndarray:
    return np.linspace(0.0, cfg.drop_path, cfg.depth, dtype=np.float32)


def _scan_stack(block_cls, cfg, pmean_axis, dtype, length: int, name: str):
    """A depth-``length`` stack of blocks as one nn.scan (optionally
    rematerialised: recompute activations in the backward instead of
    storing them — wins when the model is HBM-traffic bound)."""
    target = block_cls
    if cfg.remat:
        # arg 4 (train; 0 = self) is a python bool -> static.
        # Plain remat re-runs the whole block forward in the backward;
        # for the fused-block Pallas path that means every forward
        # kernel executes twice per step (its custom_vjp then recomputes
        # a third time in-kernel).  The selective policy below keeps the
        # remat win over no-remat (131.9 vs 140.7 ms @depth 8 — scan
        # residual stacking costs more than recompute) while SAVING the
        # fused units' outputs, so the backward skips the forward-kernel
        # re-run (the tags are applied in fused_kernels.run-unit glue).
        policy = None
        if cfg.attn_impl == "fused_block":
            policy = jax.checkpoint_policies.save_only_these_names(
                "fused_unit_out")
        target = nn.remat(block_cls, static_argnums=(4,), policy=policy)
    scanned = nn.scan(
        target,
        variable_axes={"params": 0, "intermediates": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(0, nn.broadcast, nn.broadcast),
        length=length,
    )
    return scanned(cfg, pmean_axis, dtype=dtype, name=name)


class QAViT(nn.Module):
    """Flat Quad-Attention ViT (QAViT.py:654-699)."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bank_count=0,
                 return_features: bool = False
                 ) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)

        bank_params = GlobalBankParams(cfg.bank, cfg.embed_dim,
                                       name="global_bank")()

        # Grad-CAM hook lives INSIDE PatchEmbed on the pre-LN projection
        # (test_hqa.py:243-257 hooks model.patch_embed.proj)
        t = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=dtype,
                       name="patch_embed")(x.astype(dtype))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches, cfg.embed_dim))
        t = t + pos.astype(dtype)
        t = nn.Dropout(cfg.dropout, deterministic=not train,
                       name="pos_drop")(t)

        state = bank_init_state(bank_params, bank_count)
        dpr = jnp.asarray(_drop_path_rates(cfg))
        blocks = _scan_stack(QuadAttentionBlock, cfg, self.pmean_axis, dtype,
                             cfg.depth, "blocks")
        (t, state), _ = blocks((t, state), dpr, bank_params, train)

        t = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="norm")(t)
        pooled = t.mean(axis=1)
        if return_features:
            return pooled.astype(jnp.float32), state
        logits = nn.Dense(cfg.num_classes, dtype=dtype,
                          kernel_init=dense_init, name="head")(pooled)
        return logits.astype(jnp.float32), state


class HQAViT(nn.Module):
    """Hybrid Quad-Attention ViT: CNN lateral stem + LMFA/RRCV/SplitFusion
    injected between transformer stages (HQAViT_CIFAR100.py:1141-1277)."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bank_count=0,
                 return_features: bool = False
                 ) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        hw = cfg.grid_size
        x = x.astype(dtype)

        bank_params = GlobalBankParams(cfg.bank, cfg.embed_dim,
                                       name="global_bank")()

        # lateral CNN path
        stem_cls = CNNStemV1 if cfg.stem_kind == "v1" else CNNStemConvNeXt
        f2, f3, f4 = stem_cls(cfg.cnn_c2, cfg.cnn_c3, cfg.cnn_c4, dtype=dtype,
                              name="cnn_stem")(x, train)
        laterals = [None]
        for i, f in ((2, f2), (3, f3), (4, f4)):
            a = LMFAdapter(cfg.embed_dim, hw, dtype=dtype,
                           name=f"lmfa{i}")(f)
            r = RRCV(cfg.embed_dim, cfg.rrcv_channels, cfg.rrcv_num_blocks,
                     dtype=dtype, name=f"rrcv{i}")(a, (hw, hw), train)
            laterals.append(r)

        # ViT path
        t = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=dtype,
                       name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches, cfg.embed_dim))
        t = t + pos.astype(dtype)
        t = nn.Dropout(cfg.dropout, deterministic=not train,
                       name="pos_drop")(t)

        state = bank_init_state(bank_params, bank_count)
        dpr = _drop_path_rates(cfg)
        idx = 0
        for stage_idx, nblocks in enumerate(cfg.stage_blocks, start=1):
            if nblocks == 0:
                # zero-length stages (test configs) create no params and
                # skip their fusion
                continue
            if 2 <= stage_idx <= 4 and laterals[stage_idx - 1] is not None:
                t = SplitFusion(cfg.embed_dim, cfg.dropout, dtype=dtype,
                                name=f"fuse{stage_idx}")(
                                    t, laterals[stage_idx - 1], train)
            blocks = _scan_stack(QuadBlockWithTokenLearner, cfg,
                                 self.pmean_axis, dtype, nblocks,
                                 f"stage{stage_idx}_blocks")
            stage_dpr = jnp.asarray(dpr[idx:idx + nblocks])
            (t, state), _ = blocks((t, state), stage_dpr, bank_params, train)
            idx += nblocks

        t = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="norm")(t)
        pooled = t.mean(axis=1)
        if return_features:
            return pooled.astype(jnp.float32), state
        logits = nn.Dense(cfg.num_classes, dtype=dtype,
                          kernel_init=dense_init, name="head")(pooled)
        return logits.astype(jnp.float32), state


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
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": params_rng, "dropout": dropout_rng}, dummy, train=True)
    return model, variables
