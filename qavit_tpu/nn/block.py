"""Quad-Attention transformer blocks and token compression wrappers.

Rebuilds QuadAttentionBlock (QAViT.py:588-636), TokenLearner / TokenUpMix
(HQAViT_CIFAR100.py:971-1031) and QuadBlockWithTokenLearner
(HQAViT_CIFAR100.py:1091-1123).

Blocks are **scan-compatible**: ``__call__(carry, dpr, bank_params, train)
-> (carry, None)`` with ``carry = (tokens, BankState)`` so a depth-N stack
compiles as ONE ``nn.scan`` body instead of N inlined copies — the
compile-time/idiomatic-XLA redesign of the reference's nn.ModuleList loop.
Per-depth drop-path rates arrive as the scanned input.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.nn.bank import BankState
from qavit_tpu.nn.branches import (
    ChannelGroupAttention,
    CrossAttentionBranch,
    MultiScaleDilatedAttention,
    SpatialWindowAttention,
)
from qavit_tpu.nn.layers import (
    LN_EPS,
    BottleneckMLP,
    CCFFFN,
    DropPath,
    HybridFusion,
    dense_init,
)

Carry = Tuple[jax.Array, BankState]


class QuadAttentionBlock(nn.Module):
    """pre-norm -> 4 branches (sequential bank carry) -> per-branch LN +
    compress d->d/4 -> softmax-weighted concat -> bottleneck MLP ->
    residual; then CCF-FFN residual (QAViT.py:588-636)."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, carry: Carry, dpr, bank_params,
                 train: bool = False) -> Tuple[Carry, None]:
        cfg = self.cfg
        x, state = carry

        if cfg.attn_impl == "fused_block":
            from qavit_tpu.kernels.fused_block import fused_quad_block
            from qavit_tpu.kernels.fused_params import declare_block_params
            from qavit_tpu.kernels.fused_ref import make_geom

            geom = make_geom(cfg)
            # fused path covers the single-window geometry and bypasses
            # intermediates sowing (rollout uses the reference path)
            if (geom is not None and x.shape[1] == geom.n
                    and not self.is_mutable_collection("intermediates")
                    and not self.is_initializing()):
                p = declare_block_params(cfg, geom)
                rng = self.make_rng("dropout") if train else None
                x, state = fused_quad_block(
                    p, x, state, dpr, bank_params, cfg.bank, geom,
                    self.dtype, train, rng, self.pmean_axis)
                return (x, state), None

        d_c = cfg.embed_dim // cfg.compress_ratio
        x_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm1")(x)

        # branch order (and therefore bank write order) matches the
        # reference: SWA -> MSDA -> CGA -> cross (QAViT.py:625-628)
        swa_out, state = SpatialWindowAttention(
            cfg, self.pmean_axis, dtype=self.dtype,
            name="swa")(x_norm, bank_params, state, train)
        msda_out, state = MultiScaleDilatedAttention(
            cfg, self.pmean_axis, dtype=self.dtype,
            name="msda")(x_norm, bank_params, state, train)
        cga_out, state = ChannelGroupAttention(
            cfg, self.pmean_axis, dtype=self.dtype,
            name="cga")(x_norm, bank_params, state, train)
        cross_out, state = CrossAttentionBranch(
            cfg, self.pmean_axis, dtype=self.dtype,
            name="cross_attn")(x_norm, bank_params, state, train)

        outs = []
        for name, out in (("swa", swa_out), ("msda", msda_out),
                          ("cga", cga_out), ("cross", cross_out)):
            out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                               name=f"norm_{name}")(out)
            out = nn.Dense(d_c, dtype=self.dtype, kernel_init=dense_init,
                           name=f"compress_{name}")(out)
            outs.append(out)

        fused = HybridFusion(4, name="fusion")(outs)
        mlp_out = BottleneckMLP(cfg.embed_dim // cfg.bottleneck_ratio,
                                cfg.embed_dim, cfg.dropout, dtype=self.dtype,
                                name="bottleneck_mlp")(fused, train)

        x = x + DropPath(name="drop_path1")(mlp_out, dpr, train)
        ffn_in = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm2")(x)
        ffn_out = CCFFFN(cfg.embed_dim, cfg.mlp_ratio, cfg.dropout,
                         stabilized=cfg.stabilized_ccfffn,
                         stabilized_dwconv=cfg.stabilized_dwconv,
                         dwconv_bias=cfg.dwconv_bias,
                         dtype=self.dtype, name="ccf_ffn")(ffn_in, train)
        x = x + DropPath(name="drop_path2")(ffn_out, dpr, train)
        return (x, state), None


class TokenLearner(nn.Module):
    """Compress N tokens to M via softmax-over-N weighted aggregation
    (HQAViT_CIFAR100.py:971-1002)."""

    num_out_tokens: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scores = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="attn_norm")(x)
        scores = nn.Dense(self.num_out_tokens, dtype=self.dtype,
                          kernel_init=dense_init, name="attn_fc")(scores)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
        # positional N->M map, consumed by attention rollout
        # (qavit_tpu/interpret/rollout.py)
        self.sow("intermediates", "weights", weights)
        return jnp.einsum("bnm,bnc->bmc", weights.astype(x.dtype), x)


class TokenUpMix(nn.Module):
    """Reconstruct N tokens from M via a learned linear map over the token
    axis + LN (HQAViT_CIFAR100.py:1005-1031)."""

    num_out_tokens: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # [B, M, C] -> [B, C, M] -> Dense(M->N) -> [B, N, C]
        y = x.transpose(0, 2, 1)
        y = nn.Dense(self.num_out_tokens, dtype=self.dtype,
                     kernel_init=dense_init, name="upsample_attn")(y)
        y = y.transpose(0, 2, 1)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(y)


class QuadBlockWithTokenLearner(nn.Module):
    """TokenLearner(N->M) -> QuadAttentionBlock in compressed space ->
    TokenUpMix(M->N) (HQAViT_CIFAR100.py:1091-1123).  M is snapped down to
    a perfect square as in HQAViT_IN_Tiny.py:1323-1329."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, carry: Carry, dpr, bank_params,
                 train: bool = False) -> Tuple[Carry, None]:
        cfg = self.cfg
        if not cfg.use_token_learner:
            return QuadAttentionBlock(cfg, self.pmean_axis, dtype=self.dtype,
                                      name="quad_block")(carry, dpr,
                                                         bank_params, train)
        x, state = carry
        m = cfg.num_learned_tokens
        sq = int(math.isqrt(m))
        if sq * sq != m:
            m = max(4, sq * sq)
        xc = TokenLearner(m, dtype=self.dtype, name="token_learner")(x)
        (xc, state), _ = QuadAttentionBlock(
            cfg, self.pmean_axis, dtype=self.dtype,
            name="quad_block")((xc, state), dpr, bank_params, train)
        x = TokenUpMix(cfg.num_patches, dtype=self.dtype,
                       name="token_upmix")(xc)
        return (x, state), None
