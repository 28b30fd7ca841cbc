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

JAX redesign: the bank value is threaded through the forward as an explicit
:class:`BankState` carry.  The carry starts at the parameter values, each
write produces ``carry + stop_gradient(delta)`` — the *value* advances, the
*gradient* still flows straight to the parameters from every read — and the
final carry is returned to the train step, which swaps it into the params
before the optimizer update (matching torch's forward-then-step order).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qavit_tpu.configs.model import BankConfig
from qavit_tpu.nn.layers import LN_EPS, dense_init


class BankState(NamedTuple):
    """Forward-pass carry for the global token bank."""

    k: jax.Array      # [1, S, C] fp32
    v: jax.Array      # [1, S, C] fp32
    count: jax.Array  # int32 scalar — persistent write counter


class GlobalTokenBank(nn.Module):
    cfg: BankConfig
    embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    # set to the mesh axis name when running under shard_map so the batch
    # mean in write() spans the global batch
    pmean_axis: Optional[str] = None

    def setup(self):
        s, c = self.cfg.size, self.embed_dim
        self.global_k = self.param("global_k", nn.initializers.normal(0.02),
                                   (1, s, c))
        self.global_v = self.param("global_v", nn.initializers.normal(0.02),
                                   (1, s, c))
        self.write_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                                       name="write_norm")
        self.write_compression = nn.Dense(c, dtype=jnp.float32,
                                          kernel_init=dense_init,
                                          name="write_compression")
        self.write_gate = nn.Dense(s, dtype=jnp.float32,
                                   kernel_init=dense_init, name="write_gate")

    def init_state(self, count) -> BankState:
        count = jnp.asarray(count, jnp.int32)
        return BankState(self.global_k.astype(jnp.float32),
                         self.global_v.astype(jnp.float32), count)

    def read(self, state: BankState, batch: int) -> Tuple[jax.Array, jax.Array]:
        """Broadcast bank K/V to the batch (QAViT.py:197-201)."""
        k = jnp.broadcast_to(state.k, (batch,) + state.k.shape[1:])
        v = jnp.broadcast_to(state.v, (batch,) + state.v.shape[1:])
        return k.astype(self.dtype), v.astype(self.dtype)

    def write(self, state: BankState, tokens: jax.Array,
              train: bool) -> BankState:
        """Gradient-free, clamped bank update (HQAViT_CIFAR100.py:296-321).

        The whole update path runs in fp32 under stop_gradient — in torch
        the result feeds only ``.data`` ops, so nothing differentiates
        through it and the write projections stay frozen.
        """
        if not train:
            return state
        cfg = self.cfg
        t = jax.lax.stop_gradient(tokens).astype(jnp.float32)
        t_norm = self.write_norm(t)
        compressed = self.write_compression(t_norm)
        weights = jax.nn.softmax(self.write_gate(t_norm), axis=1)  # over N

        upd_k = jnp.einsum("bnm,bnc->bmc", weights, compressed).mean(
            axis=0, keepdims=True)
        upd_v = jnp.einsum("bnm,bnc->bmc", weights, t_norm).mean(
            axis=0, keepdims=True)
        if self.pmean_axis is not None:
            upd_k = jax.lax.pmean(upd_k, self.pmean_axis)
            upd_v = jax.lax.pmean(upd_v, self.pmean_axis)
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
