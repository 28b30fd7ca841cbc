"""Mosaic-lowerable rewrites of the fused-block branch units.

The jnp twins in :mod:`qavit_tpu.kernels.fused_ref` express attention as
per-sample batched matmuls over head-split tensors.  Neither the tiny
matmuls nor the head-splitting lane reshapes lower through Mosaic, so
these cores restructure the SAME math (equal up to fp reassociation)
under three design rules derived from what this Mosaic version accepts:

1. **No lane-dim surgery in-kernel.**  Reshapes/slices/concats that
   split, merge, or offset the minor (lane) dimension do not lower (for
   bf16 not even size-1-dim inserts do).  All weight preparation that
   needs such surgery — per-head weight slicing, the block-diagonal
   ``kron(I_G, E)`` token-mix matrices, CGA's per-d-slice group weights —
   happens OUTSIDE the kernel in XLA (:func:`prep_block`), where it is
   free, differentiable, and runs once per step.  In-kernel reshapes only
   regroup leading (row) dims, which are no-ops in row-major layout.

2. **Block-diagonal G-sample grouping for the MXU.**  G=8 samples'
   queries/keys stack into one ``[G*n, d] @ [d, G*kv]`` matmul per head;
   cross-sample scores are masked to -inf before softmax so off-diagonal
   probabilities are exact zeros and the value matmul reproduces the
   per-sample outputs.  Per-head tensors come from per-head PREPPED
   weights (rule 1), so no ``[.., H*d] -> [.., H, d]`` reshape is ever
   needed; the output projection accumulates ``sum_h out_h @ Wo_h``
   instead of concatenating heads.

3. **Dropout masks are DRAWN IN-KERNEL** with the TPU PRNG
   (``pltpu.prng_seed`` / ``prng_random_bits``) instead of being
   streamed from HBM: the expanded block-diagonal masks would be tens of
   MB per attention and the streaming would forfeit the fusion's HBM win.
   The CPU twin path keeps its precomputed-mask semantics; parity tests
   compare the two at dropout 0 (realizations are arbitrary anyway).

Everything here is pure jnp (no pallas imports except the PRNG provider):
the cores are both the Pallas kernel bodies (via
fused_kernels.make_cores) and plain-XLA testable functions validated
against fused_ref in tests/test_fused_cores.py.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qavit_tpu.kernels import fused_ref as R
from qavit_tpu.kernels.fused_ref import FusedGeom


def pick_group(b: int, target: int = 8) -> int:
    g = min(b, target)
    while b % g:
        g -= 1
    return g


# ---------------------------------------------------------------------------
# dropout providers (rule 3)
# ---------------------------------------------------------------------------

class NullRng:
    """No dropout (eval, or rates 0)."""

    def attn(self, tag, ih, shape):
        return None

    def drop(self, tag, shape):
        return None

    def drop_path(self, tag, b):
        return None


class HostRng:
    """Precomputed-mask provider over :func:`fused_ref.make_block_masks`
    output — used to run the bd cores on CPU with the twin's exact mask
    realizations (tests only; reshapes below are CPU-legal)."""

    def __init__(self, masks: Dict[str, Any], geom: FusedGeom, G: int):
        self.m = masks
        self.g = geom
        self.G = G
        self.keep = 1.0 - geom.dropout

    def _swa_expand(self, mh):
        """SWA windowed twin mask [b*nw, ws2, lin_k+S] -> the bd layout
        [b, n, nw*lin_k+S] in ORIGINAL token order.  Off-window token
        column groups are exact-zero probs in the bd core (the _neg_swa
        visibility mask), so their values are don't-care (zeros)."""
        g = self.g
        lin_k = g.lin_k
        bnw, ws2, kv = mh.shape
        b = bnw // g.nw
        mw = mh.astype(jnp.float32).reshape(b, g.nw, ws2, kv)
        eye = jnp.eye(g.nw, dtype=jnp.float32)
        tok = (eye[None, :, None, :, None]
               * mw[..., None, :lin_k]).reshape(b, g.n, g.nw * lin_k)
        bank = mw[..., lin_k:].reshape(b, g.n, kv - lin_k)
        full = jnp.concatenate([tok, bank], axis=-1)
        return full[:, np.argsort(_window_perm(g))]

    def attn(self, tag, ih, shape):
        """Prescaled f32 mask in the block-diag [ng, G*n, G*kv] layout
        (broadcast along the off-diag col-group axis: those probs are
        exact zeros, any value is a no-op)."""
        m = self.m.get(tag)
        if m is None:
            return None
        if tag == "cga_attn":        # [b*gg, H, n, kv] -> [b, kv, n, gh]
            b_gg = m.shape[0]
            gg, g = self.g.groups, self.g
            b = b_gg // gg
            mk = m.reshape(b, gg, g.heads, g.n, m.shape[-1]).transpose(
                0, 4, 3, 1, 2).reshape(shape)
            return mk.astype(jnp.float32) / self.keep
        if tag == "swa_attn" and self.g.nw > 1:
            mh = self._swa_expand(m[:, ih])
        else:
            mh = m[:, ih].astype(jnp.float32)    # [b, n, kv]
        b, n, kv = mh.shape
        G = self.G
        ng = b // G
        mh = jnp.broadcast_to(
            mh.reshape(ng, G, n, 1, kv),
            (ng, G, n, G, kv)).reshape(ng, G * n, G * kv)
        return mh / self.keep

    def drop(self, tag, shape):
        m = self.m.get(tag)
        if m is None:
            return None
        m = m.astype(jnp.float32)
        if tag == "swa_proj" and self.g.nw > 1:
            # twin applies proj dropout BEFORE window reverse: reorder
            # the windowed rows to original token order
            m = m.reshape(-1, self.g.n, m.shape[-1])
            m = m[:, np.argsort(_window_perm(self.g))]
        return m / self.keep

    def drop_path(self, tag, b):
        return self.m.get(tag)          # already prescaled f32 [b, 1, 1]


def _counter(shape):
    """Flat uint32 element counter over ``shape`` via iotas."""
    x = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for d in reversed(range(len(shape))):
        it = jax.lax.broadcasted_iota(jnp.uint32, shape, d)
        x = x + it * jnp.uint32(stride)
        stride *= shape[d]
    return x


def _murmur(x, seed):
    """murmur3-style finalizer — a counter-based hash RNG that lowers as
    plain 32-bit vector int ops on every backend (no pltpu PRNG: its
    interpret emulation rides ordered callbacks, which cannot live under
    the model's ``jax.checkpoint``)."""
    x = x ^ seed
    x = x * jnp.uint32(0xCC9E2D51)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x1B873593)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xE6546B64)
    x = x ^ (x >> 16)
    return x


class PallasRng:
    """In-kernel counter-hash RNG provider, seeded per (branch, tile).
    The fwd and recompute-bwd kernels construct identical providers and
    draw in the same order, so the backward replays the same masks —
    draw ORDER is part of the numerics."""

    def __init__(self, dropout_rate: float, dpr, seeds, tile_idx):
        self.rate = dropout_rate
        self.keep = 1.0 - dropout_rate
        self.dpr = dpr                  # traced f32 scalar (drop path)
        s0 = seeds[0].astype(jnp.uint32)
        s1 = seeds[1].astype(jnp.uint32)
        t = jnp.asarray(tile_idx).astype(jnp.uint32)
        self.seed = s0 ^ (s1 * jnp.uint32(0x9E3779B9)) \
            ^ (t * jnp.uint32(0x85EBCA6B))
        self.n = 0                      # python draw counter (static)

    def _bits(self, shape):
        self.n += 1
        salt = self.seed ^ jnp.uint32(self.n * 0x01000193)
        return _murmur(_counter(shape), salt)

    def _static_mask(self, shape):
        """Static-rate mask: a pure-uint32 compare (the rate is a python
        float, so the threshold is a compile-time constant — no
        f32<->uint32 casts, which don't lower in Mosaic)."""
        thr = np.uint32(min(self.rate, 1.0) * (2.0 ** 32 - 1))
        return jnp.where(self._bits(shape) >= thr,
                         jnp.float32(1.0 / self.keep), jnp.float32(0.0))

    def attn(self, tag, ih, shape):
        if self.rate <= 0.0:
            return None
        return self._static_mask(shape)

    def drop(self, tag, shape):
        if self.rate <= 0.0:
            return None
        return self._static_mask(shape)

    def drop_path(self, tag, b):
        # traced rate: compare in f32 via the top 24 bits (int32->f32
        # conversion lowers; f32->uint32 does not)
        keep = 1.0 - self.dpr
        u = (self._bits((b, 1)) >> jnp.uint32(8)).astype(
            jnp.int32).astype(jnp.float32) * jnp.float32(2.0 ** -24)
        m = jnp.where(u >= self.dpr, 1.0 / keep, 0.0)
        return m.reshape(b, 1, 1)


def apply_drop(x, mask):
    """Multiplicative prescaled-f32-mask dropout (rule 3)."""
    if mask is None:
        return x
    return (x.astype(jnp.float32) * mask).astype(x.dtype)


def _has_nan(x):
    """Scalar NaN probe via a max-reduction (NaN propagates through
    lax.max): bool-array reductions hit unlowerable i1 relayouts in
    Mosaic, an f32 reduce + scalar isnan does not."""
    return jnp.isnan(jnp.max(x.astype(jnp.float32)))


def _launder(x):
    """Pass a tensor through an identity matmul (lane contraction).
    Reduction outputs carry replicated/implicit-dim layouts that Mosaic
    cannot relayout into matmul operands; a lane-contracting matmul
    accepts them and emits a standard layout."""
    k = x.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    eye = (r == c).astype(jnp.float32)
    x2 = x.astype(jnp.float32).reshape(-1, k)
    out = jax.lax.dot_general(x2, eye, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(x.shape)


@functools.lru_cache(maxsize=None)
def _bcast_rows_fn(b: int):
    """Broadcast [S, d] -> [b, S, d] with a HAND-WRITTEN backward.

    The auto-vjp of ``broadcast_to`` is a sum over the new leading dim,
    whose replicated-layout output Mosaic cannot relayout into the matmul
    operands further down the bank-gradient chain (lowering rule 7).  The
    manual backward launders the batch reduction through one selection
    matmul: ``sel [S, b*S] @ cot [b*S, d]`` — row-regroup reshape plus a
    standard row-contraction, both lowerable.  This is what lets the bank
    k/v ride in the kernels' *diff* group so attention reads differentiate
    into ``global_k``/``global_v`` exactly like the torch parameters
    (QAViT.py:183-224 reads of nn.Parameter) and this repo's own
    nn/bank.py contract."""

    @jax.custom_vjp
    def f(kb):
        return jnp.broadcast_to(kb[None], (b,) + kb.shape)

    def fwd(kb):
        return f(kb), kb   # residual only carries shape/dtype (tiny)

    def bwd(kb, d):
        dt = kb.dtype
        s, feat = kb.shape
        d2 = d.astype(jnp.float32).reshape(b * s, feat)
        row = jax.lax.broadcasted_iota(jnp.int32, (s, b * s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, b * s), 1)
        sel = (col % s == row).astype(jnp.float32)
        dk = jax.lax.dot_general(sel, d2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return (dk.astype(dt),)

    f.defvjp(fwd, bwd)
    return f


def bcast_rows(kb, b: int):
    """[S, d] -> [b, S, d] broadcast whose vjp lowers in Mosaic."""
    return _bcast_rows_fn(b)(kb)


def _cga_sweep(qs, ks, vs, mask, scale: float):
    """Forward of the CGA attention sweep: per-d-slice broadcast FMAs on
    a [b, kv, n, gh] f32 score tensor, kv-softmax over the OUTER dim.
    qs/ks/vs: tuples of [b, n, gh] / [b, kv, gh] f32.
    Returns (pre-mask probs, masked probs, per-d outputs [b, n, gh])."""
    b, n, gh = qs[0].shape
    kv = ks[0].shape[1]
    s = jnp.zeros((b, kv, n, gh), jnp.float32)
    for q_di, k_di in zip(qs, ks):
        s = s + q_di[:, None] * k_di[:, :, None]
    s = s * scale
    smax = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - smax)
    probs_pre = e / jnp.sum(e, axis=1, keepdims=True)
    probs = probs_pre if mask is None else probs_pre * mask
    os = tuple((probs * v_di[:, :, None]).sum(1) for v_di in vs)
    return probs_pre, probs, os


@functools.lru_cache(maxsize=None)
def _cga_attend_fn(dh: int, masked: bool, scale: float):
    """custom_vjp CGA attention with a HAND-WRITTEN backward: the
    auto-vjp of the sweep emits broadcast-reduction cotangents in
    layouts Mosaic cannot feed to the weight-grad matmuls; the manual
    backward launders every reduction through an identity matmul."""

    @jax.custom_vjp
    def attend(qs, ks, vs, mask):
        _, _, os = _cga_sweep(qs, ks, vs, mask if masked else None,
                              scale)
        return os

    def fwd(qs, ks, vs, mask):
        return attend(qs, ks, vs, mask), (qs, ks, vs, mask)

    def bwd(res, d_os):
        qs, ks, vs, mask = res
        probs_pre, probs, _ = _cga_sweep(qs, ks, vs,
                                         mask if masked else None,
                                         scale)
        # d_probs(masked) = sum_di d_o_di ⊗ v_di; pre-mask cotangent
        # multiplies by the mask
        d_pm = jnp.zeros_like(probs)
        for d_o, v_di in zip(d_os, vs):
            d_pm = d_pm + d_o[:, None] * v_di[:, :, None]
        d_pre = d_pm * mask if masked else d_pm
        # softmax backward over the kv (outer) axis, then score scale
        dot = jnp.sum(d_pre * probs_pre, axis=1, keepdims=True)
        d_s = probs_pre * (d_pre - dot) * scale
        d_qs, d_ks, d_vs = [], [], []
        for i, (q_di, k_di) in enumerate(zip(qs, ks)):
            d_qs.append(_launder((d_s * k_di[:, :, None]).sum(1)))
            d_ks.append(_launder((d_s * q_di[:, None]).sum(2)))
            d_vs.append(_launder((probs * d_os[i][:, None]).sum(2)))
        d_mask = jnp.zeros_like(mask) if masked else mask
        return tuple(d_qs), tuple(d_ks), tuple(d_vs), d_mask

    attend.defvjp(fwd, bwd)
    return attend


# ---------------------------------------------------------------------------
# prep: XLA-side weight preparation (rule 1) — all f32, differentiable
# ---------------------------------------------------------------------------

def _heads(kernel, bias, heads: int):
    """[c, H*d] packed head-major -> (w [H, c, d], b [H, d])."""
    c = kernel.shape[0]
    d = kernel.shape[1] // heads
    w = kernel.reshape(c, heads, d).transpose(1, 0, 2)
    return w, bias.reshape(heads, d)


def _kron_big(mix, G: int):
    """[m, n] shared token mix -> block-diag [G*m, G*n] (XLA-side)."""
    m, n = mix.shape
    eye = jnp.eye(G, dtype=mix.dtype)
    return (eye[:, None, :, None] * mix[None, :, None, :]).reshape(
        G * m, G * n)


def _window_perm(g: FusedGeom):
    """perm[j] = original index of the j-th token in window-major order
    (the flax SWA partition, fused_ref.window_partition)."""
    grid = math.isqrt(g.n)
    ws = math.isqrt(g.ws2)
    nh = grid // ws
    return np.arange(g.n).reshape(nh, ws, nh, ws).transpose(
        0, 2, 1, 3).reshape(-1)


def _swa_mix(e_mat, g: FusedGeom):
    """SWA Linformer mix over ORIGINAL token order: [nw*kl, n].

    Multi-window: ``kron(I_nw, E^T) @ P`` where P is the static
    window-partition permutation — row (w*kl + a) compresses window w's
    tokens with E column a, so the kernel needs no in-kernel gather."""
    if g.nw == 1:
        return e_mat.T
    perm = _window_perm(g)
    p_mat = np.zeros((g.n, g.n), np.float32)
    p_mat[np.arange(g.n), perm] = 1.0
    big = jnp.kron(jnp.eye(g.nw, dtype=e_mat.dtype), e_mat.T)
    return big @ jnp.asarray(p_mat)


def _prep_attn(qkv_kernel, qkv_bias, proj, heads: int, colsum=None):
    """Per-head q/k/v weights + out-projection rows for one branch.

    ``colsum``: (k, v) Linformer E column sums [m_tok]; the token-side
    k/v bias becomes ``colsum ⊗ b_h`` (compression commuted past the
    projection)."""
    c = qkv_kernel.shape[0]
    wq, bq = _heads(qkv_kernel[:, :c], qkv_bias[:c], heads)
    wk, bk = _heads(qkv_kernel[:, c:2 * c], qkv_bias[c:2 * c], heads)
    wv, bv = _heads(qkv_kernel[:, 2 * c:], qkv_bias[2 * c:], heads)
    d = c // heads
    # out-projection rows per head: [H*d, c] -> [H, d, c]
    wo = proj["kernel"].reshape(heads, d, c)
    p = {"wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
         "wo": wo, "bo": proj["bias"]}
    if colsum is not None:
        cs_k, cs_v = colsum
        p["kbias"] = cs_k[None, :, None] * bk[:, None, :]     # [H, m, d]
        p["vbias"] = cs_v[None, :, None] * bv[:, None, :]
    return p


def _prep_cga(p, g: FusedGeom):
    """CGA: per-d-slice block-diagonal group weights (gh = groups*heads
    effective heads on the lane axis, order (group, head))."""
    gg, heads, cperg = g.groups, g.heads, g.cperg
    dh = cperg // heads
    cpg = g.c // gg
    gh = gg * heads

    def tok_side(dp):
        # [cpg, cperg] per-group shared -> w_di [dh, c, gh] block-diag
        w = dp["kernel"].reshape(cpg, heads, dh)       # (in, ih, di)
        eye = jnp.eye(gg, dtype=w.dtype)
        w_di = w.transpose(2, 0, 1)                    # [dh, cpg, ih]
        big = (eye[None, :, None, :, None]
               * w_di[:, None, :, None, :])            # [dh,G,cpg,G,H]
        big = big.reshape(dh, gg * cpg, gh)
        b_di = dp["bias"].reshape(heads, dh).T         # [dh, H]
        b_big = jnp.tile(b_di[:, None, :], (1, gg, 1)).reshape(dh, gh)
        return big, b_big

    def bank_side(dp):
        # [c, cperg] -> per-di [dh, c, gh], the SAME head columns tiled
        # across groups (the twin broadcasts the bank projection)
        w = dp["kernel"].reshape(g.c, heads, dh).transpose(2, 0, 1)
        w = jnp.tile(w[:, :, None, :], (1, 1, gg, 1)).reshape(
            dh, g.c, gh)
        b = dp["bias"].reshape(heads, dh).T            # [dh, H]
        b = jnp.tile(b[:, None, :], (1, gg, 1)).reshape(dh, gh)
        return w, b

    wq, bq = tok_side(p["q_proj"])
    wk, bk = tok_side(p["k_proj"])
    wv, bv = tok_side(p["v_proj"])
    wbk, bbk = bank_side(p["bank_k_proj"])
    wbv, bbv = bank_side(p["bank_v_proj"])
    # out rows: proj row index = g*cperg + ih*dh + di -> per-di [gh, c]
    wo = p["proj"]["kernel"].reshape(gg, heads, dh, g.c).transpose(
        2, 0, 1, 3).reshape(dh, gh, g.c)
    return {"wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
            "wbk": wbk, "bbk": bbk, "wbv": wbv, "bbv": bbv,
            "wo": wo, "bo": p["proj"]["bias"], "norm": p["norm"]}


def prep_block(p: Dict[str, Any], g: FusedGeom, G: int) -> Dict[str, Any]:
    """All kernel-ready weights for one block (f32; cast in-kernel)."""
    heads = g.heads
    swa_e = p["swa"]["linformer"]
    sel = jnp.asarray(R.msda_mix_matrix(g))
    msda_e = {
        "E_k": p["msda"]["linformer"]["E_k"][: g.msda_keep],
        "E_v": p["msda"]["linformer"]["E_v"][: g.msda_keep],
    }
    qkv = p["swa"]["qkv"]
    cross = p["cross_attn"]
    cross_kernel = jnp.concatenate(
        [cross["q_proj"]["kernel"], cross["k_proj"]["kernel"],
         cross["v_proj"]["kernel"]], axis=1)
    cross_bias = jnp.concatenate(
        [cross["q_proj"]["bias"], cross["k_proj"]["bias"],
         cross["v_proj"]["bias"]])
    out = {
        "norm1": p["norm1"],
        "swa": {
            # per-window Linformer colsum bias repeats across windows
            "attn": _prep_attn(qkv["kernel"], qkv["bias"],
                               p["swa"]["proj"], heads,
                               colsum=(jnp.tile(swa_e["E_k"].sum(0), g.nw),
                                       jnp.tile(swa_e["E_v"].sum(0),
                                                g.nw))),
            "big_k": _kron_big(_swa_mix(swa_e["E_k"], g), G),
            "big_v": _kron_big(_swa_mix(swa_e["E_v"], g), G),
            "norm": p["swa"]["norm"],
        },
        "msda": {
            # Linformer compresses the POOLED rows: colsum over the
            # sliced E rows (zero padding contributes nothing)
            "attn": _prep_attn(p["msda"]["qkv_kernel"],
                               p["msda"]["qkv_bias"], p["msda"]["proj"],
                               heads,
                               colsum=(msda_e["E_k"].sum(0),
                                       msda_e["E_v"].sum(0))),
            "big_k": _kron_big(msda_e["E_k"].T @ sel, G),
            "big_v": _kron_big(msda_e["E_v"].T @ sel, G),
            "norm": p["msda"]["norm"],
        },
        "cga": _prep_cga(p["cga"], g),
        "cross": {
            "attn": _prep_attn(cross_kernel, cross_bias, cross["proj"],
                               heads),
        },
        "tail": _prep_tail(p, g),
    }
    return out


def _prep_tail(p, g: FusedGeom):
    c = g.c
    d_c = g.d_c
    fc1 = p["bottleneck_mlp"]["fc1"]
    # fc1 consumes the 4-branch concat: split rows per branch so the
    # kernel accumulates sum_i comp_i @ W1_i instead of lane-concatenating
    w1 = fc1["kernel"].reshape(4, d_c, g.bottleneck_hidden)
    return {
        "ln": {n: p[f"norm_{n}"] for n in ("swa", "msda", "cga", "cross")},
        "compress": {n: p[f"compress_{n}"]
                     for n in ("swa", "msda", "cga", "cross")},
        "fusion_w": p["fusion"]["fusion_weights"],
        "w1": w1, "b1": fc1["bias"],
        "fc2": p["bottleneck_mlp"]["fc2"],
        "norm2": p["norm2"],
        "ccf": p["ccf_ffn"],
    }


# ---------------------------------------------------------------------------
# in-kernel building blocks (rule 1 & 2 compliant)
# ---------------------------------------------------------------------------

def bd_mix(big, xn, G: int, dtype):
    """Shared token mix via the prepped block-diag [G*m, G*n] matrix:
    one batched matmul per G-sample group, row-regroup reshapes only."""
    b, n, c = xn.shape
    gm = big.shape[0]
    ng = b // G
    xg = xn.reshape(ng, G * n, c)
    bigb = jnp.broadcast_to(big.astype(dtype)[None], (ng,) + big.shape)
    t = jax.lax.dot_general(bigb, xg, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return t.astype(dtype).reshape(b, gm // G, c)


def _neg_offdiag(G: int, n: int, kv: int):
    """[G*n, G*kv] f32: 0 on same-sample blocks, -inf elsewhere."""
    row_g = jax.lax.broadcasted_iota(jnp.int32, (G * n, G * kv), 0) // n
    col_g = jax.lax.broadcasted_iota(jnp.int32, (G * n, G * kv), 1) // kv
    return jnp.where(row_g == col_g, 0.0, -jnp.inf).astype(jnp.float32)


def _neg_swa(g: FusedGeom, G: int):
    """SWA visibility mask [G*n, G*kv]: same sample AND (bank rows OR
    compressed rows of the token's own window) — iota arithmetic only,
    so it builds in-kernel for any window tiling."""
    kv = g.nw * g.lin_k + g.bank_s
    n = g.n
    grid = math.isqrt(n)
    ws = math.isqrt(g.ws2)
    nh = grid // ws
    r = jax.lax.broadcasted_iota(jnp.int32, (G * n, G * kv), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G * n, G * kv), 1)
    same = (r // n) == (c // kv)
    t = r % n
    cc = c % kv
    w_t = (t // grid) // ws * nh + (t % grid) // ws
    vis = same & ((cc >= g.nw * g.lin_k) | (cc // g.lin_k == w_t))
    return jnp.where(vis, 0.0, -jnp.inf).astype(jnp.float32)


def attn_heads_bd(ap, xn, tok_k, tok_v, bank, g: FusedGeom,
                  G: int, dtype, rng, tag: str, neg=None):
    """Per-head block-diagonal attention (rule 2).

    xn [b, n, c]; tok_k/tok_v [b, m_tok, c] compressed token-side k/v
    SOURCE rows (None for the cross branch).  ``bank`` is either
    ``{"k_heads": [H, S, d], "v_heads": ...}`` — RAW bank rows pre-split
    per head outside the kernel (swa/msda use the bank unprojected,
    fused_ref.swa_ref) — or ``{"k_full": [S, c], "v_full": ...}`` —
    projected per head through wk/wv in-kernel (cross branch).
    Returns the merged projected output [b, n, c] (pre-dropout).
    """
    b, n, c = xn.shape
    heads, d = g.heads, g.d
    raw_bank = "k_heads" in bank
    s_bank = (bank["k_heads"].shape[1] if raw_bank
              else bank["k_full"].shape[0])
    m_tok = 0 if tok_k is None else tok_k.shape[1]
    kv = m_tok + s_bank
    ng = b // G
    x2 = xn.reshape(b * n, c)
    t_k2 = None if tok_k is None else tok_k.reshape(b * m_tok, c)
    t_v2 = None if tok_v is None else tok_v.reshape(b * m_tok, c)

    if neg is None:
        neg = _neg_offdiag(G, n, kv)
    scale = 1.0 / math.sqrt(d)
    out2 = jnp.zeros((b * n, c), jnp.float32)
    bad = jnp.zeros((), jnp.bool_)
    for ih in range(heads):
        wq = ap["wq"][ih].astype(dtype)
        q_h = R.mm(x2, wq, dtype) + ap["bq"][ih].astype(dtype)
        parts_k, parts_v = [], []
        if tok_k is not None:
            k_tok = R.mm(t_k2, ap["wk"][ih].astype(dtype), dtype)
            k_tok = k_tok.reshape(b, m_tok, d) \
                + ap["kbias"][ih][None].astype(dtype)
            v_tok = R.mm(t_v2, ap["wv"][ih].astype(dtype), dtype)
            v_tok = v_tok.reshape(b, m_tok, d) \
                + ap["vbias"][ih][None].astype(dtype)
            parts_k.append(k_tok)
            parts_v.append(v_tok)
        if raw_bank:
            # broadcast in f32 (the bank carry dtype), cast after: the
            # custom-vjp broadcast keeps the read-gradient chain to
            # global_k/global_v lowerable (see bcast_rows)
            kb = bank["k_heads"][ih]
            vb = bank["v_heads"][ih]
        else:
            kb = R.mm(bank["k_full"].astype(dtype),
                      ap["wk"][ih].astype(dtype), dtype) \
                + ap["bk"][ih].astype(dtype)
            vb = R.mm(bank["v_full"].astype(dtype),
                      ap["wv"][ih].astype(dtype), dtype) \
                + ap["bv"][ih].astype(dtype)
        parts_k.append(bcast_rows(kb, b).astype(dtype))
        parts_v.append(bcast_rows(vb, b).astype(dtype))
        k_h = parts_k[0] if len(parts_k) == 1 else jnp.concatenate(
            parts_k, axis=1)
        v_h = parts_v[0] if len(parts_v) == 1 else jnp.concatenate(
            parts_v, axis=1)

        q_g = q_h.reshape(ng, G * n, d)
        k_g = k_h.reshape(ng, G * kv, d)
        v_g = v_h.reshape(ng, G * kv, d)
        s = jax.lax.dot_general(
            q_g, k_g, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + neg[None]
        probs = jax.nn.softmax(s, axis=-1)
        m = rng.attn(f"{tag}_attn", ih, (ng, G * n, G * kv))
        if m is not None:
            probs = probs * m
        o = jax.lax.dot_general(
            probs.astype(dtype), v_g, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if g.guard_nans:
            bad = (bad | _has_nan(q_h) | _has_nan(k_h)
                   | _has_nan(v_h) | _has_nan(o))
        o2 = o.astype(dtype).reshape(b * n, d)
        out2 = out2 + jax.lax.dot_general(
            o2, ap["wo"][ih].astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = out2.astype(dtype) + ap["bo"].astype(dtype)
    if g.guard_nans:
        out = jnp.where(bad, jnp.zeros_like(out), out)
    return out.reshape(b, n, c)


# ---------------------------------------------------------------------------
# branch cores
# ---------------------------------------------------------------------------

def swa_bd(prep, xn, bank, g: FusedGeom, G: int, dtype, rng):
    """SWA branch (fused_ref.swa_ref twin; QAViT.py:297-363).

    ``bank``: {"k_heads": [H, S, d], "v_heads": ...} raw pre-split rows.
    """
    tok_k = bd_mix(prep["big_k"], xn, G, dtype)     # [b, nw*lin_k, c]
    tok_v = bd_mix(prep["big_v"], xn, G, dtype)
    neg = _neg_swa(g, G) if g.nw > 1 else None
    out = attn_heads_bd(prep["attn"], xn, tok_k, tok_v, bank,
                        g, G, dtype, rng, "swa", neg=neg)
    out = apply_drop(out, rng.drop("swa_proj", out.shape))
    normed = R.layer_norm(out, prep["norm"], dtype)
    return out, normed


def msda_bd(prep, xn, bank, g: FusedGeom, G: int, dtype, rng):
    """MSDA branch: dilated gather + landmark pool + Linformer folded
    into the prepped mixing matrix (fused_ref.msda_ref twin)."""
    tok_k = bd_mix(prep["big_k"], xn, G, dtype)     # [b, lin_k, c]
    tok_v = bd_mix(prep["big_v"], xn, G, dtype)
    out = attn_heads_bd(prep["attn"], xn, tok_k, tok_v, bank,
                        g, G, dtype, rng, "msda")
    out = apply_drop(out, rng.drop("msda_proj", out.shape))
    normed = R.layer_norm(out, prep["norm"], dtype)
    return out, normed


def cross_bd(prep, xn, bank, g: FusedGeom, G: int, dtype, rng):
    """Cross-attention read branch (bank-only k/v, projected per head:
    ``bank`` = {"k_full": [S, c], "v_full": ...})."""
    out = attn_heads_bd(prep["attn"], xn, None, None, bank,
                        g, G, dtype, rng, "cross")
    out = apply_drop(out, rng.drop("cross_proj", out.shape))
    return out


def cga_bd(prep, xn, bank_k, bank_v, g: FusedGeom, G: int, dtype, rng):
    """CGA branch as a VPU sweep over dh=4 d-slices: all group/head
    channel routing lives in the prepped block-diag weights; scores and
    values are broadcast FMAs on a [b, n, gh, kv] f32 layout."""
    b, n, c = xn.shape
    gg, heads, cperg = g.groups, g.heads, g.cperg
    dh = cperg // heads
    gh = gg * heads
    s_bank = bank_k.shape[0]
    kv = n + s_bank
    x2 = xn.reshape(b * n, c)

    # scores laid out [b, kv, n, gh]: the kv softmax/value reductions run
    # over an OUTER dim, so the reduced outputs keep a standard lane
    # layout (a lane-axis .sum(-1) feeding a matmul hits an unlowerable
    # replicated->tiled relayout in Mosaic)
    # the whole branch runs in f32, matmuls included: it is VPU-bound
    # (head_dim 4, tiny projections), the twin's attention math is f32
    # anyway, and any bf16 operand here would force the backward to cast
    # reduction-layout cotangents to bf16 — a 32-bit-only relayout in
    # Mosaic (mixed f32xbf16 matmul transposes)
    scale = 1.0 / math.sqrt(dh)
    bad = jnp.zeros((), jnp.bool_)
    f32 = jnp.float32
    x2 = x2.astype(f32)
    bank_k = bank_k.astype(f32)
    bank_v = bank_v.astype(f32)
    qs, ks, vs = [], [], []
    for di in range(dh):
        q_di = (R.mm(x2, prep["wq"][di], f32)
                + prep["bq"][di]).reshape(b, n, gh)
        k_tok = (R.mm(x2, prep["wk"][di], f32)
                 + prep["bk"][di]).reshape(b, n, gh)
        kb = R.mm(bank_k, prep["wbk"][di], f32) + prep["bbk"][di]
        k_di = jnp.concatenate([k_tok, bcast_rows(kb, b)], axis=1)
        v_tok = (R.mm(x2, prep["wv"][di], f32)
                 + prep["bv"][di]).reshape(b, n, gh)
        vb = R.mm(bank_v, prep["wbv"][di], f32) + prep["bbv"][di]
        v_di = jnp.concatenate([v_tok, bcast_rows(vb, b)], axis=1)
        qs.append(q_di)
        ks.append(k_di)
        vs.append(v_di)
        if g.guard_nans:
            bad = (bad | _has_nan(q_di) | _has_nan(k_di)
                   | _has_nan(v_di))
    m = rng.attn("cga_attn", 0, (b, kv, n, gh))
    attend = _cga_attend_fn(dh, m is not None, scale)
    os = attend(tuple(qs), tuple(ks), tuple(vs),
                m if m is not None else jnp.zeros((1,), f32))
    out2 = jnp.zeros((b * n, c), jnp.float32)
    for di in range(dh):
        o_di = os[di]                                      # [b, n, gh]
        if g.guard_nans:
            bad = bad | _has_nan(o_di)
        out2 = out2 + jax.lax.dot_general(
            o_di.reshape(b * n, gh), prep["wo"][di],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = out2.astype(dtype) + prep["bo"].astype(dtype)
    if g.guard_nans:
        out = jnp.where(bad, jnp.zeros_like(out), out)
    out = out.reshape(b, n, c)
    out = apply_drop(out, rng.drop("cga_proj", out.shape))
    normed = R.layer_norm(out, prep["norm"], dtype)
    return out, normed


# ---------------------------------------------------------------------------
# tail core
# ---------------------------------------------------------------------------

def tail_bd(prep, xc, outs, g: FusedGeom, dtype, rng):
    """Per-branch LN+compress -> fusion -> bottleneck -> residual ->
    norm2 -> CCF-FFN -> residual (fused_ref.tail_ref twin)."""
    b, n, c = xc.shape
    w = jax.nn.softmax(prep["fusion_w"].astype(jnp.float32))
    y2 = jnp.zeros((b * n, g.bottleneck_hidden), jnp.float32)
    for i, name in enumerate(("swa", "msda", "cga", "cross")):
        o = R.layer_norm(outs[i], prep["ln"][name], dtype)
        comp = R.dense(o, {
            "kernel": prep["compress"][name]["kernel"].astype(dtype),
            "bias": prep["compress"][name]["bias"].astype(dtype)}, dtype)
        comp = (comp * w[i]).astype(dtype)
        y2 = y2 + jax.lax.dot_general(
            comp.reshape(b * n, g.d_c), prep["w1"][i].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = (y2.astype(dtype) + prep["b1"].astype(dtype)).reshape(
        b, n, g.bottleneck_hidden)
    y = R.gelu(y)
    y = apply_drop(y, rng.drop("bn1", y.shape))
    y = R.dense(y, {"kernel": prep["fc2"]["kernel"].astype(dtype),
                    "bias": prep["fc2"]["bias"].astype(dtype)}, dtype)
    y = apply_drop(y, rng.drop("bn2", y.shape))
    x = xc + R.drop_path(y, rng.drop_path("dp1", b))

    ffn_in = R.layer_norm(x, prep["norm2"], dtype)
    f = prep["ccf"]
    hw = int(math.isqrt(n))
    y = R.dense(ffn_in, {"kernel": f["fc1"]["kernel"].astype(dtype),
                         "bias": f["fc1"]["bias"].astype(dtype)}, dtype)
    y = R.gelu(y)
    if g.stabilized_ccfffn:
        y = R.layer_norm(y, f["dwconv_norm"], dtype)
    dw = f["dwconv"]
    y = R.dwconv3x3_ref(y, dw["dwconv"]["kernel"], (hw, hw), dtype)
    if "bias" in dw["dwconv"]:          # conv bias precedes the 0.1 scale
        y = y + dw["dwconv"]["bias"].astype(y.dtype)
    if g.stabilized_dwconv:
        y = y * dw["scale"].astype(y.dtype)
    if g.stabilized_ccfffn:
        y = R.layer_norm(y, f["post_dwconv_norm"], dtype)
    y = R.dense(y, {"kernel": f["fc2"]["kernel"].astype(dtype),
                    "bias": f["fc2"]["bias"].astype(dtype)}, dtype)
    y = apply_drop(y, rng.drop("ffn", y.shape))
    if g.stabilized_ccfffn:
        y = (y * f["gamma"].astype(jnp.float32)).astype(y.dtype)
    return x + R.drop_path(y, rng.drop_path("dp2", b))
