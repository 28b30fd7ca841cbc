"""Quad-Attention transformer blocks and token compression wrappers.

Rebuilds QuadAttentionBlock (QAViT.py:588-636), TokenLearner / TokenUpMix
(HQAViT_CIFAR100.py:971-1031) and QuadBlockWithTokenLearner
(HQAViT_CIFAR100.py:1091-1123) with the bank as an explicit carry.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.nn.bank import BankState, GlobalTokenBank
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


class QuadAttentionBlock(nn.Module):
    """pre-norm -> 4 branches (sequential bank carry) -> per-branch LN +
    compress d->d/4 -> softmax-weighted concat -> bottleneck MLP ->
    residual; then CCF-FFN residual (QAViT.py:588-636)."""

    cfg: ModelConfig
    bank: GlobalTokenBank
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, state: BankState,
                 train: bool = False) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        d_c = cfg.embed_dim // cfg.compress_ratio
        x_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm1")(x)

        # branch order (and therefore bank write order) matches the
        # reference: SWA -> MSDA -> CGA -> cross (QAViT.py:625-628)
        swa_out, state = SpatialWindowAttention(
            cfg, self.bank, dtype=self.dtype, name="swa")(x_norm, state, train)
        msda_out, state = MultiScaleDilatedAttention(
            cfg, self.bank, dtype=self.dtype, name="msda")(x_norm, state, train)
        cga_out, state = ChannelGroupAttention(
            cfg, self.bank, dtype=self.dtype, name="cga")(x_norm, state, train)
        cross_out, state = CrossAttentionBranch(
            cfg, self.bank, dtype=self.dtype,
            name="cross_attn")(x_norm, state, train)

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

        x = x + DropPath(self.drop_path, name="drop_path1")(mlp_out, train)
        ffn_in = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm2")(x)
        ffn_out = CCFFFN(cfg.embed_dim, cfg.mlp_ratio, cfg.dropout,
                         stabilized=cfg.stabilized_ccfffn,
                         stabilized_dwconv=cfg.stabilized_dwconv,
                         dtype=self.dtype, name="ccf_ffn")(ffn_in, train)
        x = x + DropPath(self.drop_path, name="drop_path2")(ffn_out, train)
        return x, state


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
        out = jnp.einsum("bnm,bnc->bmc", weights.astype(x.dtype), x)
        return out


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
    bank: GlobalTokenBank
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, state: BankState,
                 train: bool = False) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        if not cfg.use_token_learner:
            return QuadAttentionBlock(cfg, self.bank, self.drop_path,
                                      dtype=self.dtype,
                                      name="quad_block")(x, state, train)
        m = cfg.num_learned_tokens
        sq = int(math.isqrt(m))
        if sq * sq != m:
            m = max(4, sq * sq)
        n = cfg.num_patches
        xc = TokenLearner(m, dtype=self.dtype, name="token_learner")(x)
        xc, state = QuadAttentionBlock(cfg, self.bank, self.drop_path,
                                       dtype=self.dtype,
                                       name="quad_block")(xc, state, train)
        x = TokenUpMix(n, dtype=self.dtype, name="token_upmix")(xc)
        return x, state
