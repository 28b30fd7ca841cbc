"""Train state: params + optimizer + EMA + bank counter, as one pytree.

Replaces the reference's implicit state scattered across the torch module,
GradScaler, ModelEMA deepcopy and the bank's in-place buffers
(HQAViT_CIFAR100.py:128-184, :1589-1598) with a single functional
TrainState that orbax can checkpoint/restore at step granularity.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from qavit_tpu.nn.bank import BankState


@struct.dataclass
class TrainState:
    step: jax.Array                      # int32
    params: Any
    opt_state: Any
    batch_stats: Any                     # {} when the model has no BN
    ema_params: Any                      # None when EMA disabled
    ema_batch_stats: Any
    bank_count: jax.Array                # int32 — persistent bank writes
    ema_decay: jax.Array                 # float32 — warmup-scheduled


def create_train_state(params, tx, batch_stats=None, use_ema: bool = True,
                       ema_decay: float = 0.999) -> TrainState:
    batch_stats = batch_stats if batch_stats is not None else {}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        ema_batch_stats=(jax.tree.map(jnp.copy, batch_stats)
                         if use_ema else None),
        bank_count=jnp.zeros((), jnp.int32),
        ema_decay=jnp.asarray(ema_decay, jnp.float32),
    )


def swap_bank(params, bank: BankState):
    """Write the post-forward bank carry back into the params — the
    functional equivalent of torch's in-place ``.data`` update having
    already happened when ``optimizer.step()`` runs.

    Searches nested scopes so wrapped models (e.g. SimCLRNet's backbone
    at ``HQAViT_0/global_bank``) work too.
    """
    if "global_bank" in params:
        gb = dict(params["global_bank"])
        gb["global_k"] = bank.k.astype(gb["global_k"].dtype)
        gb["global_v"] = bank.v.astype(gb["global_v"].dtype)
        out = dict(params)
        out["global_bank"] = gb
        return out
    for key, sub in params.items():
        if isinstance(sub, dict) and "global_bank" in sub:
            out = dict(params)
            out[key] = swap_bank(sub, bank)
            return out
    return params


def ema_update(ema_params, params, decay):
    """EMA of parameters (HQAViT_CIFAR100.py:139-156).  Buffers (our
    batch_stats) are copied, not averaged — handled by the caller."""
    return jax.tree.map(
        lambda e, p: (decay * e.astype(jnp.float32)
                      + (1.0 - decay) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params, params)


def ema_warmup_decay(epoch: int, warmup_epochs: int, decay_warmup: float,
                     decay: float) -> float:
    """Linear decay warmup over the warmup epochs
    (HQAViT_CIFAR100.py:1633-1637)."""
    if warmup_epochs <= 0 or epoch > warmup_epochs:
        return decay
    return decay_warmup + (decay - decay_warmup) * (epoch / warmup_epochs)


def ema_distance(ema_params, params,
                 ema_batch_stats=None, batch_stats=None
                 ) -> Tuple[jax.Array, jax.Array]:
    """L2 distance diagnostics between EMA and live trees
    (HQAViT_CIFAR100.py:158-180)."""

    def sq_dist(a, b):
        leaves_a = jax.tree.leaves(a)
        leaves_b = jax.tree.leaves(b)
        total = jnp.zeros((), jnp.float32)
        for la, lb in zip(leaves_a, leaves_b):
            d = la.astype(jnp.float32) - lb.astype(jnp.float32)
            total = total + jnp.sum(d * d)
        return jnp.sqrt(total)

    param_dist = sq_dist(ema_params, params)
    if ema_batch_stats is not None and batch_stats:
        buffer_dist = sq_dist(ema_batch_stats, batch_stats)
    else:
        buffer_dist = jnp.zeros((), jnp.float32)
    return param_dist, buffer_dist


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
