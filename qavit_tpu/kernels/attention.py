"""Attention dispatch: XLA reference path + Pallas fused path.

The XLA path is the numerics reference (replacement for the reference's
``F.scaled_dot_product_attention`` fallback, QAViT.py:284) and is used for
degenerate shapes (e.g. the channel-group branch's head_dim=4).  The Pallas
path (:mod:`qavit_tpu.kernels.flash_attention`) replaces the flash-attn CUDA
kernels (QAViT.py:26-30) and fuses QK^T + softmax + dropout + PV in VMEM.

Layout: ``[B, N, H, D]`` (head axis AFTER tokens).  Profiling showed the
classic ``[B, H, N, D]`` layout costs two materialised transposes per
projection; with BNHD the einsums absorb the layout and the surrounding
reshape to/from ``[B, N, C]`` is free.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from qavit_tpu.kernels.flash_attention import flash_attention


def xla_attention(q, k, v, dropout_rate: float = 0.0,
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None):
    """Scaled dot-product attention with fp32 softmax.

    Args:
      q: [B, Nq, H, D]; k, v: [B, Nkv, H, D]
    Returns:
      [B, Nq, H, D] in q.dtype
    """
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# Pallas needs head_dim padded to 128 lanes; below this the padding waste
# makes XLA's batched dot_general the faster choice.
_PALLAS_MIN_HEAD_DIM = 32
_PALLAS_MIN_NQ = 128


def use_pallas(q_shape, backend: Optional[str] = None) -> bool:
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    _, n_q, _, d = q_shape
    return d >= _PALLAS_MIN_HEAD_DIM and n_q >= _PALLAS_MIN_NQ


@jax.custom_vjp
def _pallas_attention(q, k, v):
    """Deterministic Pallas-forward attention with an XLA-recompute
    backward: the flash kernel has no native vjp, and without this rule
    any training graph touching the Pallas path fails to trace.  The
    backward is mathematically the attention transpose (recompute, no
    residuals) — it only applies to the DETERMINISTIC path, since XLA
    cannot replay the kernel's in-kernel dropout masks."""
    b, n_q, h, d = q.shape
    n_kv = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, n_q, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, n_kv, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, n_kv, d)
    out = flash_attention(qf, kf, vf)
    return out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)


def _pallas_attention_fwd(q, k, v):
    return _pallas_attention(q, k, v), (q, k, v)


def _pallas_attention_bwd(res, ct):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v), q, k, v)
    return vjp(ct)


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def attention(q, k, v, dropout_rate: float = 0.0, deterministic: bool = True,
              rng: Optional[jax.Array] = None, impl: str = "auto"):
    """Unified attention entry point (replaces ``efficient_attention``,
    QAViT.py:259; the NaN guard lives in the caller, nn/branches.py).

    Args:
      q: [B, Nq, H, D]; k, v: [B, Nkv, H, D]
      impl: "auto" | "xla" | "pallas"
    """
    train_dropout = dropout_rate > 0.0 and not deterministic
    if impl == "fused_block":
        # "fused_block" is a BLOCK-level impl (kernels/fused_block.py);
        # when the flax branch path runs anyway (param init, rollout
        # with intermediates, unsupported geometry) the per-attention
        # choice falls back to the per-shape dispatch.  Before this
        # mapping the string fell through to the raw Pallas call.
        impl = "auto"
    if impl == "auto":
        # the Pallas fwd pairs with an XLA-recompute bwd that cannot
        # replay in-kernel dropout masks — train-with-dropout stays XLA
        impl = ("pallas" if use_pallas(q.shape) and not train_dropout
                else "xla")
    if impl == "xla":
        return xla_attention(q, k, v, dropout_rate, deterministic, rng)
    if impl != "pallas":
        raise ValueError(f"unknown attention impl {impl!r}; "
                         "expected auto | xla | pallas")
    if train_dropout:
        # explicit pallas request with dropout: fwd-only semantics
        b, n_q, h, d = q.shape
        n_kv = k.shape[1]
        qf = q.transpose(0, 2, 1, 3).reshape(b * h, n_q, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, n_kv, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, n_kv, d)
        seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
        out = flash_attention(qf, kf, vf, seed=seed,
                              dropout_rate=dropout_rate)
        return out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
    return _pallas_attention(q, k, v)
