"""Pure-function twins of the QuadBlockWithTokenLearner units.

These mirror the flax reference path (nn/block.py, nn/branches.py,
nn/layers.py — themselves rebuilt from QAViT.py:297-636 and
HQAViT_CIFAR100.py:659-1123) as pure functions over explicit parameter
pytrees (the exact trees the flax modules create).  They are:

* the numerics reference the Pallas fused kernels are validated against,
* the recompute-backward for the fused path's ``jax.custom_vjp``,
* the non-TPU fallback of ``attn_impl="fused_block"``.

Geometry is specialised to the fused-supported case: a single-window token
grid (``n == window_size**2``, i.e. every TokenLearner-compressed HQA-ViT
stage and any config whose block-level token count is one SWA window).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from qavit_tpu.configs.model import ModelConfig

LN_EPS = 1e-5


class FusedGeom(NamedTuple):
    """Static geometry of one fused block (derived from ModelConfig)."""

    n: int                 # tokens inside the block (single SWA window)
    c: int                 # embed dim
    heads: int
    d: int                 # head dim
    lin_k: int             # linformer compressed length
    msda_keep: int         # pooled MSDA token count (pre-pad, <= pad_len)
    msda_idx: Tuple[int, ...]   # flat multi-scale gather indices
    pool_stride: int       # landmark pooling stride
    groups: int            # CGA channel groups
    cperg: int             # CGA compressed channels per group
    bank_s: int            # bank slots
    n_full: int            # tokens OUTSIDE the token learner (num_patches)
    m_learned: int         # learned tokens (== n when token learner on)
    ccf_hidden: int
    bottleneck_hidden: int
    d_c: int               # per-branch compressed dim (c // compress_ratio)
    dropout: float
    stabilized_ccfffn: bool
    stabilized_dwconv: bool
    guard_nans: bool
    use_token_learner: bool


def make_geom(cfg: ModelConfig) -> Optional[FusedGeom]:
    """Geometry if the fused path supports this config, else None."""
    if cfg.use_token_learner:
        m = cfg.num_learned_tokens
        sq = int(math.isqrt(m))
        if sq * sq != m:
            m = max(4, sq * sq)
        n = m
    else:
        n = cfg.num_patches
    grid = int(math.isqrt(n))
    if grid * grid != n:
        return None
    if cfg.window_size ** 2 != n:          # single-window SWA only
        return None
    # multi-scale dilated gather indices on the block's grid
    idx = []
    for dil in cfg.dilation_factors:
        rows = range(0, grid, dil)
        idx.extend(r * grid + col for r in rows for col in range(0, grid,
                                                                 dil))
    s = cfg.landmark_pooling_stride
    keep = (len(idx) // s) * s
    pooled = keep // s
    if pooled > cfg.msda_pad_len:
        pooled = cfg.msda_pad_len
    comp_c = cfg.embed_dim // 2
    return FusedGeom(
        n=n, c=cfg.embed_dim, heads=cfg.num_heads, d=cfg.head_dim,
        lin_k=cfg.linformer_k, msda_keep=pooled,
        msda_idx=tuple(idx[:keep]), pool_stride=s,
        groups=cfg.num_channel_groups,
        cperg=comp_c // cfg.num_channel_groups,
        bank_s=cfg.bank.size, n_full=cfg.num_patches, m_learned=n,
        ccf_hidden=int(cfg.embed_dim * cfg.mlp_ratio),
        bottleneck_hidden=cfg.embed_dim // cfg.bottleneck_ratio,
        d_c=cfg.embed_dim // cfg.compress_ratio,
        dropout=cfg.dropout,
        stabilized_ccfffn=cfg.stabilized_ccfffn,
        stabilized_dwconv=cfg.stabilized_dwconv,
        guard_nans=cfg.guard_nans,
        use_token_learner=cfg.use_token_learner,
    )


# ---------------------------------------------------------------------------
# primitive twins (flax-matching numerics: fp32 statistics, bf16 compute)
# ---------------------------------------------------------------------------

def layer_norm(x, p, dtype):
    """flax nn.LayerNorm twin (fast variance, fp32 stats)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def dense(x, p, dtype):
    y = x.astype(dtype) @ p["kernel"].astype(dtype)
    return y + p["bias"].astype(dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def dropout(x, rate: float, rng, train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def drop_path(x, rate, rng, train: bool):
    if not train or rng is None:
        return x
    keep_prob = 1.0 - jnp.asarray(rate, jnp.float32)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep_prob, shape)
    return jnp.where(mask, x / keep_prob.astype(x.dtype), 0.0).astype(
        x.dtype)


def attention_core(q, k, v, *, dropout_rate: float, rng, train: bool,
                   guard: bool):
    """xla_attention + NaN guard twin: q/k/v [B, N, H, D] (BNHD)."""
    d = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and train and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if not guard:
        return out
    bad = (jnp.isnan(q).any() | jnp.isnan(k).any() | jnp.isnan(v).any()
           | jnp.isnan(out).any())
    return jnp.where(bad, jnp.zeros_like(out), out)


def split_heads(x, h):
    b, n, c = x.shape
    return x.reshape(b, n, h, c // h)


def merge_heads(x):
    b, n, h, d = x.shape
    return x.reshape(b, n, h * d)


def bank_write_partial(bank_params: Dict[str, Any], normed) -> Tuple[
        jax.Array, jax.Array]:
    """Per-batch SUM of the gated bank update (finished into a mean +
    clamps by the glue, qavit_tpu/nn/bank.py:bank_write)."""
    t = jax.lax.stop_gradient(normed).astype(jnp.float32)
    p = {k: jax.lax.stop_gradient(v).astype(jnp.float32)
         for k, v in bank_params.items()}
    mu = t.mean(-1, keepdims=True)
    var = t.var(-1, keepdims=True)
    t_norm = (t - mu) * jax.lax.rsqrt(var + LN_EPS)
    t_norm = t_norm * p["write_norm_scale"] + p["write_norm_bias"]
    compressed = (t_norm @ p["write_compression_kernel"]
                  + p["write_compression_bias"])
    weights = jax.nn.softmax(
        t_norm @ p["write_gate_kernel"] + p["write_gate_bias"], axis=1)
    part_k = jnp.einsum("bnm,bnc->mc", weights, compressed)
    part_v = jnp.einsum("bnm,bnc->mc", weights, t_norm)
    return part_k, part_v


# ---------------------------------------------------------------------------
# unit twins
# ---------------------------------------------------------------------------

def tl_norm1_ref(p_tl, p_norm1, x, g: FusedGeom, dtype):
    """TokenLearner (N_full -> M) + block pre-norm.  Returns (xc, xn)."""
    if g.use_token_learner:
        scores = layer_norm(x, p_tl["attn_norm"], dtype)
        scores = dense(scores, p_tl["attn_fc"], dtype)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
        xc = jnp.einsum("bnm,bnc->bmc", w.astype(x.dtype), x)
    else:
        xc = x
    xn = layer_norm(xc, p_norm1, dtype)
    return xc, xn


def swa_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *, train=False,
            rngs=(None, None)):
    """Single-window SWA branch (QAViT.py:297-363 at n == ws^2).

    bank_k/bank_v: [1, S, C] fp32 state values.  Returns (out, normed).
    """
    b = xn.shape[0]
    qkv = dense(xn, p["qkv"], dtype)
    q, k, v = (split_heads(t, g.heads) for t in jnp.split(qkv, 3, axis=-1))
    e_k = p["linformer"]["E_k"].astype(dtype)
    e_v = p["linformer"]["E_v"].astype(dtype)
    k_c = jnp.einsum("nm,bnhd->bmhd", e_k, k)
    v_c = jnp.einsum("nm,bnhd->bmhd", e_v, v)
    kb = jnp.broadcast_to(bank_k, (b,) + bank_k.shape[1:]).astype(dtype)
    vb = jnp.broadcast_to(bank_v, (b,) + bank_v.shape[1:]).astype(dtype)
    k_full = jnp.concatenate([k_c, split_heads(kb, g.heads)], axis=1)
    v_full = jnp.concatenate([v_c, split_heads(vb, g.heads)], axis=1)
    out = attention_core(q, k_full, v_full, dropout_rate=g.dropout,
                         rng=rngs[0], train=train, guard=g.guard_nans)
    out = dense(merge_heads(out), p["proj"], dtype)
    out = dropout(out, g.dropout, rngs[1], train)
    normed = layer_norm(out, p["norm"], dtype)
    return out, normed


def msda_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *, train=False,
             rngs=(None, None)):
    """MSDA branch (QAViT.py:366-426): dilated gather + landmark pooling +
    linformer on the REAL pooled rows (zero-padding contributes nothing)."""
    b = xn.shape[0]
    kernel = p["qkv_kernel"].astype(dtype)
    bias = p["qkv_bias"].astype(dtype)
    c = g.c
    idx = jnp.asarray(g.msda_idx, jnp.int32)
    x_multi = jnp.take(xn, idx, axis=1)                     # [B, M*, C]
    m = x_multi.shape[1]
    s = g.pool_stride
    pooled = x_multi[:, : (m // s) * s].reshape(b, m // s, s, c).mean(2)
    pooled = pooled[:, : g.msda_keep]       # reference pad_len truncation
    kv = pooled.astype(dtype) @ kernel[:, c:] + bias[c:]
    k, v = (split_heads(t, g.heads) for t in jnp.split(kv, 2, axis=-1))
    # linformer over the padded-to-pad_len axis == contraction with the
    # first msda_keep rows of E (the rest hit zero padding)
    e_k = p["linformer"]["E_k"][: g.msda_keep].astype(dtype)
    e_v = p["linformer"]["E_v"][: g.msda_keep].astype(dtype)
    k_c = jnp.einsum("nm,bnhd->bmhd", e_k, k)
    v_c = jnp.einsum("nm,bnhd->bmhd", e_v, v)
    kb = jnp.broadcast_to(bank_k, (b,) + bank_k.shape[1:]).astype(dtype)
    vb = jnp.broadcast_to(bank_v, (b,) + bank_v.shape[1:]).astype(dtype)
    k_full = jnp.concatenate([k_c, split_heads(kb, g.heads)], axis=1)
    v_full = jnp.concatenate([v_c, split_heads(vb, g.heads)], axis=1)
    q = split_heads(xn.astype(dtype) @ kernel[:, :c] + bias[:c], g.heads)
    out = attention_core(q, k_full, v_full, dropout_rate=g.dropout,
                         rng=rngs[0], train=train, guard=g.guard_nans)
    out = dense(merge_heads(out), p["proj"], dtype)
    out = dropout(out, g.dropout, rngs[1], train)
    normed = layer_norm(out, p["norm"], dtype)
    return out, normed


def cga_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *, train=False,
            rngs=(None, None)):
    """CGA branch (QAViT.py:429-489)."""
    b, n, c = xn.shape
    gg, cpg, cperg = g.groups, g.c // g.groups, g.cperg
    xg = xn.reshape(b, n, gg, cpg).transpose(0, 2, 1, 3).reshape(
        b * gg, n, cpg)
    q = split_heads(dense(xg, p["q_proj"], dtype), g.heads)
    k = split_heads(dense(xg, p["k_proj"], dtype), g.heads)
    v = split_heads(dense(xg, p["v_proj"], dtype), g.heads)
    kb = jnp.broadcast_to(bank_k, (b,) + bank_k.shape[1:]).astype(dtype)
    vb = jnp.broadcast_to(bank_v, (b,) + bank_v.shape[1:]).astype(dtype)
    kbp = dense(kb, p["bank_k_proj"], dtype)               # [B, S, cperg]
    vbp = dense(vb, p["bank_v_proj"], dtype)
    s_tokens = kbp.shape[1]
    kbp = jnp.broadcast_to(kbp[:, None], (b, gg, s_tokens, cperg)).reshape(
        b * gg, s_tokens, cperg)
    vbp = jnp.broadcast_to(vbp[:, None], (b, gg, s_tokens, cperg)).reshape(
        b * gg, s_tokens, cperg)
    k_full = jnp.concatenate([k, split_heads(kbp, g.heads)], axis=1)
    v_full = jnp.concatenate([v, split_heads(vbp, g.heads)], axis=1)
    out = attention_core(q, k_full, v_full, dropout_rate=g.dropout,
                         rng=rngs[0], train=train, guard=g.guard_nans)
    out = merge_heads(out).reshape(b, gg, n, cperg).transpose(
        0, 2, 1, 3).reshape(b, n, gg * cperg)
    out = dense(out, p["proj"], dtype)
    out = dropout(out, g.dropout, rngs[1], train)
    normed = layer_norm(out, p["norm"], dtype)
    return out, normed


def cross_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *, train=False,
              rngs=(None, None)):
    """Cross-attention branch (QAViT.py:492-520) — no bank write."""
    b = xn.shape[0]
    q = split_heads(dense(xn, p["q_proj"], dtype), g.heads)
    kb = jnp.broadcast_to(bank_k, (b,) + bank_k.shape[1:]).astype(dtype)
    vb = jnp.broadcast_to(bank_v, (b,) + bank_v.shape[1:]).astype(dtype)
    k = split_heads(dense(kb, p["k_proj"], dtype), g.heads)
    v = split_heads(dense(vb, p["v_proj"], dtype), g.heads)
    out = attention_core(q, k, v, dropout_rate=g.dropout, rng=rngs[0],
                         train=train, guard=g.guard_nans)
    out = dense(merge_heads(out), p["proj"], dtype)
    out = dropout(out, g.dropout, rngs[1], train)
    return out


def dwconv3x3_ref(x, kernel, hw: Tuple[int, int], dtype):
    """Depthwise 3x3 'SAME' conv over a [B, N, C] token grid.

    kernel: [3, 3, 1, C] (flax grouped-conv layout)."""
    b, n, c = x.shape
    h, w = hw
    y = x.reshape(b, h, w, c).astype(dtype)
    return jax.lax.conv_general_dilated(
        y, kernel.astype(dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c).reshape(b, n, c)


def tail_ref(p, xc, outs, dpr, g: FusedGeom, dtype, *, train=False,
             rngs=(None,) * 6):
    """Per-branch LN+compress -> fusion -> bottleneck -> residual ->
    norm2 -> CCF-FFN -> residual (QAViT.py:588-636 tail)."""
    compressed = []
    for name, out in zip(("swa", "msda", "cga", "cross"), outs):
        o = layer_norm(out, p[f"norm_{name}"], dtype)
        compressed.append(dense(o, p[f"compress_{name}"], dtype))
    w = jax.nn.softmax(p["fusion"]["fusion_weights"].astype(jnp.float32))
    fused = jnp.concatenate(
        [o * w[i].astype(o.dtype) for i, o in enumerate(compressed)],
        axis=-1)
    y = dense(fused, p["bottleneck_mlp"]["fc1"], dtype)
    y = gelu(y)
    y = dropout(y, g.dropout, rngs[0], train)
    y = dense(y, p["bottleneck_mlp"]["fc2"], dtype)
    y = dropout(y, g.dropout, rngs[1], train)
    x = xc + drop_path(y, dpr, rngs[2], train)

    ffn_in = layer_norm(x, p["norm2"], dtype)
    f = p["ccf_ffn"]
    hw = int(math.isqrt(g.n))
    y = dense(ffn_in, f["fc1"], dtype)
    y = gelu(y)
    if g.stabilized_ccfffn:
        y = layer_norm(y, f["dwconv_norm"], dtype)
    dw = f["dwconv"]
    y = dwconv3x3_ref(y, dw["dwconv"]["kernel"], (hw, hw), dtype)
    if g.stabilized_dwconv:
        y = y * dw["scale"].astype(y.dtype)
    else:
        y = y + dw["dwconv"]["bias"].astype(y.dtype)
    if g.stabilized_ccfffn:
        y = layer_norm(y, f["post_dwconv_norm"], dtype)
    y = dense(y, f["fc2"], dtype)
    y = dropout(y, g.dropout, rngs[3], train)
    if g.stabilized_ccfffn:
        y = y * f["gamma"].astype(y.dtype)
    return x + drop_path(y, dpr, rngs[4], train)


def upmix_ref(p, y, g: FusedGeom, dtype):
    """TokenUpMix (M -> N_full) + LN (HQAViT_CIFAR100.py:1005-1031)."""
    if not g.use_token_learner:
        return y
    z = y.transpose(0, 2, 1)
    z = dense(z, p["upsample_attn"], dtype)
    z = z.transpose(0, 2, 1)
    return layer_norm(z, p["norm"], dtype)
