"""Pure-function twins of the QuadBlockWithTokenLearner units.

These mirror the flax reference path (nn/block.py, nn/branches.py,
nn/layers.py — themselves rebuilt from QAViT.py:297-636 and
HQAViT_CIFAR100.py:659-1123) as pure functions over explicit parameter
pytrees (the exact trees the flax modules create).  They are:

* the numerics reference the Pallas fused kernels are validated against,
* the recompute-backward for the fused path's ``jax.custom_vjp``,
* the non-TPU fallback of ``attn_impl="fused_block"``.

Geometry covers any square token grid that tiles cleanly into SWA
windows (``grid % window_size == 0``): single-window TokenLearner
stages (hqavit_c100) and multi-window grids (qavit_v2_c100 / EXTREME at
64 tokens / 4 windows, hqavit_tiny_in at 64 learned tokens).
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

    n: int                 # tokens inside the block
    c: int                 # embed dim
    ws2: int               # tokens per SWA window (window_size**2)
    nw: int                # SWA windows per sample (1 = single-window)
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
    dwconv_bias: bool       # QAViTv2.py:861 stabilised-with-bias variant
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
    ws = cfg.window_size
    if grid % ws != 0:                     # clean window tiling only
        return None
    nw = (grid // ws) ** 2
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
        n=n, c=cfg.embed_dim, ws2=ws * ws, nw=nw,
        heads=cfg.num_heads, d=cfg.head_dim,
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
        dwconv_bias=cfg.dwconv_bias,
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


def mm(a, b, dtype):
    """Matmul (contract a's last dim with b's first) with explicit fp32
    accumulation: Mosaic requires 32-bit matmul accumulators, and XLA's
    TPU bf16 matmul accumulates in fp32 anyway — numerics unchanged.

    Leading dims are flattened to 2-D first: the weight-grad transpose of
    a 3-D @ 2-D dot_general contracts TWO dims, which Mosaic's tpu.matmul
    cannot lower; flattened, every transpose stays a single-contraction
    matmul."""
    lead = a.shape[:-1]
    a2 = a.reshape(-1, a.shape[-1])
    out = jax.lax.dot_general(a2, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(dtype).reshape(*lead, b.shape[-1])


def dense(x, p, dtype):
    y = mm(x.astype(dtype), p["kernel"].astype(dtype), dtype)
    return y + p["bias"].astype(dtype)


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7): Mosaic
    implements neither erf nor erfc, so the exact-GELU path needs a
    polynomial built from lowerable ops (exp, fma)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def gelu(x):
    """Exact (erf) GELU — matches flax nn.gelu(approximate=False) (and
    torch nn.GELU) to ~1e-7 absolute; jax.nn.gelu lowers through erfc,
    which Mosaic does not implement."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf(xf * jnp.float32(0.7071067811865476)))
    return y.astype(x.dtype)


def dropout(x, rate: float, mask):
    """Inverted dropout from a precomputed bool keep-mask (built by
    :func:`make_block_masks` — shared by the jnp twins and the Pallas
    kernels so both paths are bit-identical given one rng)."""
    if mask is None or rate <= 0.0:
        return x
    return jnp.where(mask, x / (1.0 - rate), 0.0).astype(x.dtype)


def drop_path(x, mask):
    """Stochastic depth from a PRESCALED float mask (0 or 1/keep_prob,
    [B, 1, 1]) so the traced rate never enters the kernels."""
    if mask is None:
        return x
    # mask stays fp32: Mosaic cannot squeeze bf16 size-1 arrays to
    # scalars; the product is rounded back to x.dtype
    return (x * mask).astype(x.dtype)


def make_block_masks(rng, b: int, g: "FusedGeom", dpr, train: bool):
    """Build every dropout / drop-path keep-mask for one block forward.

    Mask generation stays OUTSIDE the fused kernels (plain jax.random in
    XLA): bool masks are cheap to stream and keep the Pallas path exactly
    equal to the jnp-twin path under the same rng."""
    if not train or rng is None:
        return {k: None for k in _MASK_KEYS}
    r = jax.random.split(rng, 14)
    keep = 1.0 - g.dropout
    n, c, h, gg = g.n, g.c, g.heads, g.groups

    def bern(key, shape, p=keep):
        return jax.random.bernoulli(key, p, shape)

    kv = g.lin_k + g.bank_s
    masks = {
        # SWA masks live in the windowed layout (flax applies attention
        # + proj dropout BEFORE the window reverse)
        "swa_attn": bern(r[0], (b * g.nw, h, g.ws2, kv)),
        "swa_proj": bern(r[1], (b * g.nw, g.ws2, c)),
        "msda_attn": bern(r[2], (b, h, n, kv)),
        "msda_proj": bern(r[3], (b, n, c)),
        "cga_attn": bern(r[4], (b * gg, h, n, n + g.bank_s)),
        "cga_proj": bern(r[5], (b, n, c)),
        "cross_attn": bern(r[6], (b, h, n, g.bank_s)),
        "cross_proj": bern(r[7], (b, n, c)),
        "bn1": bern(r[8], (b, n, g.bottleneck_hidden)),
        "bn2": bern(r[9], (b, n, c)),
        "dp1": _dp_mask(r[10], b, dpr),
        "ffn": bern(r[11], (b, n, c)),
        "dp2": _dp_mask(r[12], b, dpr),
    }
    if g.dropout <= 0.0:
        for k in masks:
            if k not in ("dp1", "dp2"):
                masks[k] = None
    return masks


_MASK_KEYS = ("swa_attn", "swa_proj", "msda_attn", "msda_proj", "cga_attn",
              "cga_proj", "cross_attn", "cross_proj", "bn1", "bn2", "dp1",
              "ffn", "dp2")


def _dp_mask(key, b: int, dpr):
    """Prescaled drop-path mask: 0 or 1/keep_prob, fp32 [B, 1, 1]."""
    keep_prob = 1.0 - jnp.asarray(dpr, jnp.float32)
    keep = jax.random.bernoulli(key, keep_prob, (b, 1, 1))
    return jnp.where(keep, 1.0 / keep_prob, 0.0)


def attention_core(q, k, v, *, dropout_rate: float, mask, guard: bool):
    """xla_attention + NaN guard twin: q/k/v [B, N, H, D] (BNHD)."""
    d = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and mask is not None:
        probs = jnp.where(mask, probs / (1.0 - dropout_rate), 0.0)
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
    # einsum "bnm,bnc->mc" as a 2D transposed matmul (Mosaic supports
    # only single contracting dims)
    slots = weights.shape[-1]
    w2 = weights.reshape(-1, slots)
    dims = (((0,), (0,)), ((), ()))
    part_k = jax.lax.dot_general(
        w2, compressed.reshape(-1, compressed.shape[-1]), dims,
        preferred_element_type=jnp.float32)
    part_v = jax.lax.dot_general(
        w2, t_norm.reshape(-1, t_norm.shape[-1]), dims,
        preferred_element_type=jnp.float32)
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


def window_partition(x, g: FusedGeom):
    """[B, N, C] -> [B*nw, ws2, C] in window-major order (the flax SWA
    partition, nn/branches.py:79-85; no-op when nw == 1)."""
    if g.nw == 1:
        return x
    b, n, c = x.shape
    grid = int(math.isqrt(n))
    ws = int(math.isqrt(g.ws2))
    nh = grid // ws
    xw = x.reshape(b, nh, ws, nh, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b * g.nw, g.ws2, c)


def window_reverse(xw, g: FusedGeom, b: int):
    """[B*nw, ws2, C] -> [B, N, C] (inverse of window_partition)."""
    if g.nw == 1:
        return xw
    c = xw.shape[-1]
    grid = int(math.isqrt(g.n))
    ws = int(math.isqrt(g.ws2))
    nh = grid // ws
    x = xw.reshape(b, nh, nh, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g.n, c)


def swa_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *,
            masks=(None, None)):
    """SWA branch (QAViT.py:297-363): windowed attention with per-window
    Linformer compression + bank keys; single-window is the nw == 1
    special case.

    bank_k/bank_v: [1, S, C] fp32 state values.  Returns (out, normed).
    """
    b = xn.shape[0]
    xw = window_partition(xn, g)
    bw = xw.shape[0]
    qkv = dense(xw, p["qkv"], dtype)
    q, k, v = (split_heads(t, g.heads) for t in jnp.split(qkv, 3, axis=-1))
    e_k = p["linformer"]["E_k"].astype(dtype)
    e_v = p["linformer"]["E_v"].astype(dtype)
    k_c = jnp.einsum("nm,bnhd->bmhd", e_k, k,
                     preferred_element_type=jnp.float32).astype(dtype)
    v_c = jnp.einsum("nm,bnhd->bmhd", e_v, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    kb = jnp.broadcast_to(bank_k, (bw,) + bank_k.shape[1:]).astype(dtype)
    vb = jnp.broadcast_to(bank_v, (bw,) + bank_v.shape[1:]).astype(dtype)
    k_full = jnp.concatenate([k_c, split_heads(kb, g.heads)], axis=1)
    v_full = jnp.concatenate([v_c, split_heads(vb, g.heads)], axis=1)
    out = attention_core(q, k_full, v_full, dropout_rate=g.dropout,
                         mask=masks[0], guard=g.guard_nans)
    out = dense(merge_heads(out), p["proj"], dtype)
    out = dropout(out, g.dropout, masks[1])
    out = window_reverse(out, g, b)
    normed = layer_norm(out, p["norm"], dtype)
    return out, normed


def msda_mix_matrix(g: FusedGeom):
    """Dilated gather + landmark average-pooling (QAViT.py:383-395) as one
    constant token-mixing matrix [msda_keep, n]: row i averages the
    gathered tokens idx[i*s:(i+1)*s].  Shared across the batch, so the
    whole pipeline becomes a matmul (MXU) instead of a gather."""
    import numpy as np
    m = np.zeros((g.msda_keep, g.n), np.float32)
    s = g.pool_stride
    for i in range(g.msda_keep):
        for j in range(s):
            m[i, g.msda_idx[i * s + j]] += 1.0 / s
    return m


def msda_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *,
             masks=(None, None), sel=None):
    """MSDA branch (QAViT.py:366-426): dilated gather + landmark pooling
    (as the shared mixing matmul above) + linformer on the REAL pooled
    rows (zero-padding contributes nothing)."""
    b = xn.shape[0]
    kernel = p["qkv_kernel"].astype(dtype)
    bias = p["qkv_bias"].astype(dtype)
    c = g.c
    if sel is None:
        sel = jnp.asarray(msda_mix_matrix(g))
    pooled = jnp.einsum("pn,bnc->bpc", sel.astype(dtype),
                        xn.astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
    kv = mm(pooled, kernel[:, c:], dtype) + bias[c:]
    k, v = (split_heads(t, g.heads) for t in jnp.split(kv, 2, axis=-1))
    # linformer over the padded-to-pad_len axis == contraction with the
    # first msda_keep rows of E (the rest hit zero padding)
    e_k = p["linformer"]["E_k"][: g.msda_keep].astype(dtype)
    e_v = p["linformer"]["E_v"][: g.msda_keep].astype(dtype)
    k_c = jnp.einsum("nm,bnhd->bmhd", e_k, k,
                     preferred_element_type=jnp.float32).astype(dtype)
    v_c = jnp.einsum("nm,bnhd->bmhd", e_v, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    kb = jnp.broadcast_to(bank_k, (b,) + bank_k.shape[1:]).astype(dtype)
    vb = jnp.broadcast_to(bank_v, (b,) + bank_v.shape[1:]).astype(dtype)
    k_full = jnp.concatenate([k_c, split_heads(kb, g.heads)], axis=1)
    v_full = jnp.concatenate([v_c, split_heads(vb, g.heads)], axis=1)
    q = split_heads(mm(xn.astype(dtype), kernel[:, :c], dtype)
                    + bias[:c], g.heads)
    out = attention_core(q, k_full, v_full, dropout_rate=g.dropout,
                         mask=masks[0], guard=g.guard_nans)
    out = dense(merge_heads(out), p["proj"], dtype)
    out = dropout(out, g.dropout, masks[1])
    normed = layer_norm(out, p["norm"], dtype)
    return out, normed


def cga_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *,
            masks=(None, None)):
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
                         mask=masks[0], guard=g.guard_nans)
    out = merge_heads(out).reshape(b, gg, n, cperg).transpose(
        0, 2, 1, 3).reshape(b, n, gg * cperg)
    out = dense(out, p["proj"], dtype)
    out = dropout(out, g.dropout, masks[1])
    normed = layer_norm(out, p["norm"], dtype)
    return out, normed


def cross_ref(p, xn, bank_k, bank_v, g: FusedGeom, dtype, *,
              masks=(None, None)):
    """Cross-attention branch (QAViT.py:492-520) — no bank write."""
    b = xn.shape[0]
    q = split_heads(dense(xn, p["q_proj"], dtype), g.heads)
    kb = jnp.broadcast_to(bank_k, (b,) + bank_k.shape[1:]).astype(dtype)
    vb = jnp.broadcast_to(bank_v, (b,) + bank_v.shape[1:]).astype(dtype)
    k = split_heads(dense(kb, p["k_proj"], dtype), g.heads)
    v = split_heads(dense(vb, p["v_proj"], dtype), g.heads)
    out = attention_core(q, k, v, dropout_rate=g.dropout, mask=masks[0],
                         guard=g.guard_nans)
    out = dense(merge_heads(out), p["proj"], dtype)
    out = dropout(out, g.dropout, masks[1])
    return out


def dwconv3x3_ref(x, kernel, hw: Tuple[int, int], dtype):
    """Depthwise 3x3 'SAME' conv over a [B, N, C] token grid as 9
    shifted FMAs (``lax.conv`` does not lower inside Pallas kernels;
    on a 4x4 grid the taps are cheaper than a conv launch anyway).

    kernel: [3, 3, 1, C] (flax grouped-conv layout, correlation).

    The zero halo is built with concats, not ``jnp.pad``: JAX transposes
    pad as a NEGATIVE-config pad, which Mosaic cannot lower — concat
    transposes to slices (and slice transposes to positive pads), both
    supported.  The taps run in f32 — matching XLA's TPU conv (bf16 in,
    f32 accumulate, one rounding at the end) and keeping the 4-D
    reshapes 32-bit (Mosaic rejects sublane-splitting shape casts on
    bf16)."""
    b, n, c = x.shape
    h, w = hw
    y = x.reshape(b, h, w, c).astype(jnp.float32)
    k = kernel.reshape(3, 3, c).astype(jnp.float32)
    zr = jnp.zeros((b, 1, w, c), y.dtype)
    yp = jnp.concatenate([zr, y, zr], axis=1)
    zc = jnp.zeros((b, h + 2, 1, c), y.dtype)
    yp = jnp.concatenate([zc, yp, zc], axis=2)
    out = jnp.zeros_like(y)
    for ki in range(3):
        for kj in range(3):
            out = out + yp[:, ki:ki + h, kj:kj + w, :] * k[ki, kj]
    return out.reshape(b, n, c).astype(dtype)


def tail_ref(p, xc, outs, g: FusedGeom, dtype, *,
             masks=(None,) * 5):
    """Per-branch LN+compress -> fusion -> bottleneck -> residual ->
    norm2 -> CCF-FFN -> residual (QAViT.py:588-636 tail).

    ``masks`` = (bn1, bn2, dp1, ffn, dp2) keep-masks."""
    compressed = []
    for name, out in zip(("swa", "msda", "cga", "cross"), outs):
        o = layer_norm(out, p[f"norm_{name}"], dtype)
        compressed.append(dense(o, p[f"compress_{name}"], dtype))
    w = jax.nn.softmax(p["fusion"]["fusion_weights"].astype(jnp.float32))
    # w[i] stays an fp32 scalar (bf16 scalar squeezes don't lower)
    fused = jnp.concatenate(
        [(o * w[i]).astype(o.dtype) for i, o in enumerate(compressed)],
        axis=-1)
    y = dense(fused, p["bottleneck_mlp"]["fc1"], dtype)
    y = gelu(y)
    y = dropout(y, g.dropout, masks[0])
    y = dense(y, p["bottleneck_mlp"]["fc2"], dtype)
    y = dropout(y, g.dropout, masks[1])
    x = xc + drop_path(y, masks[2])

    ffn_in = layer_norm(x, p["norm2"], dtype)
    f = p["ccf_ffn"]
    hw = int(math.isqrt(g.n))
    y = dense(ffn_in, f["fc1"], dtype)
    y = gelu(y)
    if g.stabilized_ccfffn:
        y = layer_norm(y, f["dwconv_norm"], dtype)
    dw = f["dwconv"]
    y = dwconv3x3_ref(y, dw["dwconv"]["kernel"], (hw, hw), dtype)
    if "bias" in dw["dwconv"]:          # conv bias precedes the 0.1 scale
        y = y + dw["dwconv"]["bias"].astype(y.dtype)
    if g.stabilized_dwconv:
        y = y * dw["scale"].astype(y.dtype)
    if g.stabilized_ccfffn:
        y = layer_norm(y, f["post_dwconv_norm"], dtype)
    y = dense(y, f["fc2"], dtype)
    y = dropout(y, g.dropout, masks[3])
    if g.stabilized_ccfffn:
        y = (y * f["gamma"].astype(jnp.float32)).astype(y.dtype)
    return x + drop_path(y, masks[4])


def upmix_ref(p, y, g: FusedGeom, dtype):
    """TokenUpMix (M -> N_full) + LN (HQAViT_CIFAR100.py:1005-1031)."""
    if not g.use_token_learner:
        return y
    z = y.transpose(0, 2, 1)
    z = dense(z, p["upsample_attn"], dtype)
    z = z.transpose(0, 2, 1)
    return layer_norm(z, p["norm"], dtype)
