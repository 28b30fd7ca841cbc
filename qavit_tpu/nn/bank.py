"""Global token bank — the functional redesign of the reference's stateful
``GlobalTokenBank`` (QAViT.py:183-224 v1; HQAViT_CIFAR100.py:275-321 v2).

Torch semantics being reproduced:

* ``global_k``/``global_v`` are *parameters*: attention reads differentiate
  into them, so the optimizer updates them from read-gradients.
* ``write()`` additionally mutates them **in place, outside autograd**
  during the forward pass (train only): a softmax-gated pooled update,
  clamped per-update and post-update, with a warmup-scheduled rate keyed on
  a persistent ``update_count`` buffer.  Writes are sequential — later
  blocks/branches read the values written by earlier ones *within the same
  forward*.
* The write-path projections (write_norm / write_compression / write_gate)
  never receive gradients in torch (their outputs feed only ``.data`` ops),
  so they stay frozen at init; the training engine masks them from weight
  decay to match (see qavit_tpu/train/optim.py).

JAX redesign: the bank is *pure data*.  :class:`GlobalBankParams` is a
parameter holder; the live bank value is a :class:`BankState` carry
threaded through the transformer's ``nn.scan`` over blocks.  Each write
produces ``carry + stop_gradient(delta)`` — the *value* advances, the
*gradient* still flows straight to the parameters from every read — and
the final carry is returned to the train step, which swaps it into the
params before the optimizer update (matching torch's forward-then-step
order).  Keeping the bank as plain arrays (not a shared module) is what
lets the block stack compile as one scanned XLA body.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qavit_tpu.configs.model import BankConfig


class BankState(NamedTuple):
    """Forward-pass carry for the global token bank."""

    k: jax.Array      # [1, S, C] fp32
    v: jax.Array      # [1, S, C] fp32
    count: jax.Array  # int32 scalar — persistent write counter


class GlobalBankParams(nn.Module):
    """Parameter holder: returns the bank parameter dict.

    Lives under the ``global_bank`` scope so the train step can find and
    swap the k/v values (qavit_tpu/train/state.py:swap_bank).
    """

    cfg: BankConfig
    embed_dim: int

    @nn.compact
    def __call__(self) -> Dict[str, jax.Array]:
        s, c = self.cfg.size, self.embed_dim
        init = nn.initializers
        return {
            "global_k": self.param("global_k", init.normal(0.02), (1, s, c)),
            "global_v": self.param("global_v", init.normal(0.02), (1, s, c)),
            "write_norm_scale": self.param("write_norm_scale", init.ones,
                                           (c,)),
            "write_norm_bias": self.param("write_norm_bias", init.zeros,
                                          (c,)),
            "write_compression_kernel": self.param(
                "write_compression_kernel", init.normal(0.02), (c, c)),
            "write_compression_bias": self.param(
                "write_compression_bias", init.zeros, (c,)),
            "write_gate_kernel": self.param("write_gate_kernel",
                                            init.normal(0.02), (c, s)),
            "write_gate_bias": self.param("write_gate_bias", init.zeros,
                                          (s,)),
        }


def bank_init_state(bank_params: Dict[str, jax.Array], count) -> BankState:
    count = jnp.asarray(count, jnp.int32)
    return BankState(bank_params["global_k"].astype(jnp.float32),
                     bank_params["global_v"].astype(jnp.float32), count)


def bank_read(state: BankState, batch: int,
              dtype) -> Tuple[jax.Array, jax.Array]:
    """Broadcast bank K/V to the batch (QAViT.py:197-201)."""
    k = jnp.broadcast_to(state.k, (batch,) + state.k.shape[1:])
    v = jnp.broadcast_to(state.v, (batch,) + state.v.shape[1:])
    return k.astype(dtype), v.astype(dtype)


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def bank_write(bank_params: Dict[str, jax.Array], cfg: BankConfig,
               state: BankState, tokens: jax.Array, train: bool,
               pmean_axis: Optional[str] = None) -> BankState:
    """Gradient-free, clamped bank update (HQAViT_CIFAR100.py:296-321).

    The whole update path runs in fp32 under stop_gradient — in torch the
    result feeds only ``.data`` ops, so nothing differentiates through it
    and the write projections stay frozen at init.
    """
    if not train:
        return state
    t = jax.lax.stop_gradient(tokens).astype(jnp.float32)
    p = {k: jax.lax.stop_gradient(v).astype(jnp.float32)
         for k, v in bank_params.items()}
    t_norm = _layer_norm(t, p["write_norm_scale"], p["write_norm_bias"])
    compressed = (t_norm @ p["write_compression_kernel"]
                  + p["write_compression_bias"])
    weights = jax.nn.softmax(
        t_norm @ p["write_gate_kernel"] + p["write_gate_bias"], axis=1)

    upd_k = jnp.einsum("bnm,bnc->bmc", weights, compressed).mean(
        axis=0, keepdims=True)
    upd_v = jnp.einsum("bnm,bnc->bmc", weights, t_norm).mean(
        axis=0, keepdims=True)
    if pmean_axis is not None:
        upd_k = jax.lax.pmean(upd_k, pmean_axis)
        upd_v = jax.lax.pmean(upd_v, pmean_axis)
    upd_k = jnp.clip(upd_k, -cfg.update_clamp, cfg.update_clamp)
    upd_v = jnp.clip(upd_v, -cfg.update_clamp, cfg.update_clamp)

    rate = jnp.where(state.count < cfg.warmup_writes,
                     cfg.update_rate_warm, cfg.update_rate)
    new_k_val = jnp.clip(state.k + rate * upd_k,
                         -cfg.value_clamp, cfg.value_clamp)
    new_v_val = jnp.clip(state.v + rate * upd_v,
                         -cfg.value_clamp, cfg.value_clamp)
    # value advances, gradient stays identity to the carry (and thus the
    # bank parameters) — the JAX analogue of torch's .data mutation
    new_k = state.k + jax.lax.stop_gradient(new_k_val - state.k)
    new_v = state.v + jax.lax.stop_gradient(new_v_val - state.v)
    return BankState(new_k, new_v, state.count + 1)
