"""Pallas TPU fused attention kernel.

TPU-native replacement for the reference's FlashAttention-2 CUDA path
(reference: QAViT.py:259-291, HQAViT_CIFAR100.py:355-397).  The QA-ViT
branch attentions are *small-KV cross attentions*: N_q up to 576, N_kv
between 16 and 144, head_dim 4..64.  Unlike a standard flash kernel we
never need an online softmax — the full key set fits one VMEM tile — so the
kernel fuses QK^T, masked softmax, optional probability dropout, and PV
into a single VMEM-resident pass per (batch*head) slice, eliminating the
HBM round-trip for the [N_q, N_kv] score matrix.

Layout: q [BH, Nq, D], k/v [BH, Nkv, D] with BH = folded batch * heads.
The wrapper pads Nq/Nkv/D to TPU tile boundaries and slices the result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _attn_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 n_kv: int, dropout_rate: float):
    """One grid step handles a tile of BH slices; full Nq x Nkv in VMEM."""
    q = q_ref[0, :, :]                       # [Nq_p, D_p]
    k = k_ref[0, :, :]                       # [Nkv_p, D_p]
    v = v_ref[0, :, :]

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # [Nq_p, Nkv_p] fp32

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_kv, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits(p.shape)
        # uniform in [0, 1) from the top 24 bits
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        keep = u >= dropout_rate
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dropout_rate", "interpret"))
def flash_attention(q, k, v, seed=None, dropout_rate: float = 0.0,
                    interpret: bool = False):
    """Fused small-KV attention.

    Args:
      q: [BH, Nq, D]
      k, v: [BH, Nkv, D]
      seed: int32 scalar array for dropout PRNG (required if dropout_rate>0)
      dropout_rate: dropout on attention probabilities (train only)
    Returns:
      [BH, Nq, D] in q.dtype
    """
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    dtype = q.dtype

    sl = _sublane(dtype)
    n_q_p = _round_up(n_q, sl)
    n_kv_p = _round_up(n_kv, sl)
    d_p = _round_up(d, _LANE)

    qp = jnp.pad(q, ((0, 0), (0, n_q_p - n_q), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, n_kv_p - n_kv), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, n_kv_p - n_kv), (0, d_p - d)))
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = functools.partial(
        _attn_kernel, scale=1.0 / (d ** 0.5), n_kv=n_kv,
        dropout_rate=dropout_rate)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, n_q_p, d_p), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv_p, d_p), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv_p, d_p), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_q_p, d_p), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_q_p, d_p), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n_q * n_kv * d * 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * n_q * n_kv,
        ),
        interpret=interpret,
    )(seed, qp, kp, vp)

    return out[:, :n_q, :d]
