"""The four Quad-Attention branches (SURVEY.md §2.2).

TPU-first redesigns of:

* EfficientSpatialWindowAttention  (QAViT.py:297-363)
* EfficientMultiScaleDilatedAttention (QAViT.py:366-426)
* EfficientChannelGroupAttention   (QAViT.py:429-489)
* CrossAttentionBranch             (QAViT.py:492-520)

Every branch signature is ``branch(x, bank_state, train) -> (out, bank')``:
the global token bank is an explicit carry (see nn/bank.py) instead of the
reference's in-place parameter mutation.  Window partitioning / dilated
subsampling are pure static reshapes that XLA folds away; attention runs
through the kernels dispatch layer (Pallas fused kernel or XLA).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.kernels.attention import attention
from qavit_tpu.nn.bank import BankState, bank_read, bank_write
from qavit_tpu.nn.layers import LN_EPS, LinformerCompression, dense_init


def guarded_attention(q, k, v, *, dropout: float, train: bool,
                      rng: Optional[jax.Array], impl: str,
                      guard: bool) -> jax.Array:
    """Attention with the reference's whole-tensor NaN guard: if any input
    or the output contains NaN, return zeros (QAViT.py:261-289)."""
    out = attention(q, k, v, dropout_rate=dropout, deterministic=not train,
                    rng=rng, impl=impl)
    if not guard:
        return out
    bad = (jnp.isnan(q).any() | jnp.isnan(k).any() | jnp.isnan(v).any()
           | jnp.isnan(out).any())
    return jnp.where(bad, jnp.zeros_like(out), out)


def _split_heads(x, num_heads):
    # [B, N, C] -> [B, N, H, D]: a pure reshape — the BNHD attention layout
    # needs no transpose (profiling showed materialised head-transposes
    # cost ~30% of the train step)
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads)


def _merge_heads(x):
    b, n, h, d = x.shape
    return x.reshape(b, n, h * d)


class SpatialWindowAttention(nn.Module):
    """SWA: windowed attention with Linformer-compressed K/V + bank keys,
    writing its normed output back to the bank (QAViT.py:297-363)."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, bank_params, state: BankState,
                 train: bool = False) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        b, n, c = x.shape
        h = w = int(math.isqrt(n))
        ws = cfg.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        hp, wp = h + pad_h, w + pad_w

        # window partition: [B, N, C] -> [B*nW, ws*ws, C]
        xw = x.reshape(b, h, w, c)
        if pad_h or pad_w:
            xw = jnp.pad(xw, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        nh, nw = hp // ws, wp // ws
        xw = xw.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, ws * ws, c)
        bw = xw.shape[0]

        qkv = nn.Dense(3 * c, dtype=self.dtype, kernel_init=dense_init,
                       name="qkv")(xw)
        q, k, v = (
            _split_heads(t, cfg.num_heads)
            for t in jnp.split(qkv, 3, axis=-1)
        )

        k_c, v_c = LinformerCompression(ws * ws, cfg.linformer_k,
                                        dtype=self.dtype,
                                        name="linformer")(k, v)

        k_bank, v_bank = bank_read(state, bw, self.dtype)   # [BW, S, C]
        k_bank = _split_heads(k_bank, cfg.num_heads)
        v_bank = _split_heads(v_bank, cfg.num_heads)
        k_full = jnp.concatenate([k_c, k_bank], axis=1)
        v_full = jnp.concatenate([v_c, v_bank], axis=1)

        # interpretability taps (free: sow is a no-op unless the caller
        # makes "intermediates" mutable) — rollout recomputes the softmax
        # from these and maps it back to window positions via |E_k|
        # (interpret/rollout.py)
        self.sow("intermediates", "attn_q", q)
        self.sow("intermediates", "attn_k", k_full)

        rng = self.make_rng("dropout") if train and cfg.dropout > 0 else None
        out = guarded_attention(q, k_full, v_full, dropout=cfg.dropout,
                                train=train, rng=rng, impl=cfg.attn_impl,
                                guard=cfg.guard_nans)
        out = _merge_heads(out)                       # [BW, ws*ws, C]

        out = nn.Dense(c, dtype=self.dtype, kernel_init=dense_init,
                       name="proj")(out)
        out = nn.Dropout(cfg.dropout, deterministic=not train)(out)

        # window reverse -> [B, N, C]
        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, c)[:, :h, :w].reshape(b, n, c)

        normed = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm")(out)
        state = bank_write(bank_params, cfg.bank, state, normed, train,
                           self.pmean_axis)
        return out, state


class MultiScaleDilatedAttention(nn.Module):
    """MSDA: full-resolution queries against dilation-subsampled,
    landmark-pooled, Linformer-compressed keys + bank (QAViT.py:366-426).

    The reference computes the full fused QKV on both the pooled set (using
    only K/V, QAViT.py:398) and the full tokens (using only Q, :417); we
    keep one shared QKV projection but slice its kernel so each side only
    pays for the columns it uses — identical numerics, 1/3 the FLOPs.
    """

    cfg: ModelConfig
    pmean_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, bank_params, state: BankState,
                 train: bool = False) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        b, n, c = x.shape
        h = w = int(math.isqrt(n))

        kernel = self.param("qkv_kernel", dense_init, (c, 3 * c))
        bias = self.param("qkv_bias", nn.initializers.zeros, (3 * c,))
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)

        # multi-scale dilated subsampling (pure strided slicing)
        grid = x.reshape(b, h, w, c)
        scales = [grid[:, ::d, ::d].reshape(b, -1, c)
                  for d in cfg.dilation_factors]
        x_multi = jnp.concatenate(scales, axis=1)     # [B, M, C]

        # landmark average pooling along the token axis (AvgPool1d k=s=2)
        s = cfg.landmark_pooling_stride
        m = x_multi.shape[1]
        x_pooled = x_multi[:, : (m // s) * s].reshape(b, m // s, s, c).mean(2)

        kv = x_pooled.astype(self.dtype) @ kernel[:, c:] + bias[c:]
        k, v = (
            _split_heads(t, cfg.num_heads) for t in jnp.split(kv, 2, axis=-1)
        )
        # pad/truncate pooled K/V to the fixed msda length (QAViT.py:401-406)
        nm = k.shape[1]
        pad_len = cfg.msda_pad_len
        if nm < pad_len:
            pad = ((0, 0), (0, pad_len - nm), (0, 0), (0, 0))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        elif nm > pad_len:
            k, v = k[:, :pad_len], v[:, :pad_len]

        k_c, v_c = LinformerCompression(pad_len, cfg.linformer_k,
                                        dtype=self.dtype,
                                        name="linformer")(k, v)

        k_bank, v_bank = bank_read(state, b, self.dtype)
        k_full = jnp.concatenate([k_c, _split_heads(k_bank, cfg.num_heads)],
                                 axis=1)
        v_full = jnp.concatenate([v_c, _split_heads(v_bank, cfg.num_heads)],
                                 axis=1)

        # queries from the full-resolution tokens (QAViT.py:417)
        q = _split_heads(x.astype(self.dtype) @ kernel[:, :c] + bias[:c],
                         cfg.num_heads)

        rng = self.make_rng("dropout") if train and cfg.dropout > 0 else None
        out = guarded_attention(q, k_full, v_full, dropout=cfg.dropout,
                                train=train, rng=rng, impl=cfg.attn_impl,
                                guard=cfg.guard_nans)
        out = _merge_heads(out)

        out = nn.Dense(c, dtype=self.dtype, kernel_init=dense_init,
                       name="proj")(out)
        out = nn.Dropout(cfg.dropout, deterministic=not train)(out)

        normed = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm")(out)
        state = bank_write(bank_params, cfg.bank, state, normed, train,
                           self.pmean_axis)
        return out, state


class ChannelGroupAttention(nn.Module):
    """CGA: attention inside channel groups with compressed per-group
    projections and bank keys (QAViT.py:429-489).  The fold B->B*G and the
    tiny head_dim make this an XLA-einsum branch."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, bank_params, state: BankState,
                 train: bool = False) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        b, n, c = x.shape
        g = cfg.num_channel_groups
        cpg = c // g                       # channels per group
        comp_c = c // 2                    # total compressed channels
        cperg = comp_c // g                # compressed per group
        bg = b * g

        xg = x.reshape(b, n, g, cpg).transpose(0, 2, 1, 3).reshape(bg, n, cpg)

        q = nn.Dense(cperg, dtype=self.dtype, kernel_init=dense_init,
                     name="q_proj")(xg)
        k = nn.Dense(cperg, dtype=self.dtype, kernel_init=dense_init,
                     name="k_proj")(xg)
        v = nn.Dense(cperg, dtype=self.dtype, kernel_init=dense_init,
                     name="v_proj")(xg)
        q = _split_heads(q, cfg.num_heads)
        k = _split_heads(k, cfg.num_heads)
        v = _split_heads(v, cfg.num_heads)

        k_bank, v_bank = bank_read(state, b, self.dtype)     # [B, S, C]
        k_bank = nn.Dense(cperg, dtype=self.dtype, kernel_init=dense_init,
                          name="bank_k_proj")(k_bank)
        v_bank = nn.Dense(cperg, dtype=self.dtype, kernel_init=dense_init,
                          name="bank_v_proj")(v_bank)
        s_tokens = k_bank.shape[1]
        k_bank = jnp.broadcast_to(k_bank[:, None],
                                  (b, g, s_tokens, cperg)).reshape(
                                      bg, s_tokens, cperg)
        v_bank = jnp.broadcast_to(v_bank[:, None],
                                  (b, g, s_tokens, cperg)).reshape(
                                      bg, s_tokens, cperg)
        k_full = jnp.concatenate([k, _split_heads(k_bank, cfg.num_heads)],
                                 axis=1)
        v_full = jnp.concatenate([v, _split_heads(v_bank, cfg.num_heads)],
                                 axis=1)

        rng = self.make_rng("dropout") if train and cfg.dropout > 0 else None
        # head_dim here is comp_c/g/heads (e.g. 4) — always the XLA path
        out = guarded_attention(q, k_full, v_full, dropout=cfg.dropout,
                                train=train, rng=rng, impl="xla",
                                guard=cfg.guard_nans)
        out = _merge_heads(out)                        # [BG, N, cperg]
        out = out.reshape(b, g, n, cperg).transpose(0, 2, 1, 3).reshape(
            b, n, comp_c)

        out = nn.Dense(c, dtype=self.dtype, kernel_init=dense_init,
                       name="proj")(out)
        out = nn.Dropout(cfg.dropout, deterministic=not train)(out)

        normed = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm")(out)
        state = bank_write(bank_params, cfg.bank, state, normed, train,
                           self.pmean_axis)
        return out, state


class CrossAttentionBranch(nn.Module):
    """Pure bank-read branch: Q from tokens, K/V from the 16-token bank,
    no write-back (QAViT.py:492-520)."""

    cfg: ModelConfig
    pmean_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, bank_params, state: BankState,
                 train: bool = False) -> Tuple[jax.Array, BankState]:
        cfg = self.cfg
        b, n, c = x.shape

        q = _split_heads(nn.Dense(c, dtype=self.dtype,
                                  kernel_init=dense_init,
                                  name="q_proj")(x), cfg.num_heads)
        k_bank, v_bank = bank_read(state, b, self.dtype)
        k = _split_heads(nn.Dense(c, dtype=self.dtype,
                                  kernel_init=dense_init,
                                  name="k_proj")(k_bank), cfg.num_heads)
        v = _split_heads(nn.Dense(c, dtype=self.dtype,
                                  kernel_init=dense_init,
                                  name="v_proj")(v_bank), cfg.num_heads)

        rng = self.make_rng("dropout") if train and cfg.dropout > 0 else None
        out = guarded_attention(q, k, v, dropout=cfg.dropout, train=train,
                                rng=rng, impl=cfg.attn_impl,
                                guard=cfg.guard_nans)
        out = _merge_heads(out)

        out = nn.Dense(c, dtype=self.dtype, kernel_init=dense_init,
                       name="proj")(out)
        out = nn.Dropout(cfg.dropout, deterministic=not train)(out)
        return out, state
