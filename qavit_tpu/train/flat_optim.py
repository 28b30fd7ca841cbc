"""Flattened-parameter AdamW: the whole update as a handful of big vector ops.

The model has ~487 parameter leaves; the per-leaf optax chain (adam m/v,
weight decay, LR scale) plus the two-level clipping and EMA issue well over
a thousand tiny fused loops per step — measured at ~19.5 ms of the 118 ms
flagship step (docs/PERF_NOTES.md round-3 step decomposition), almost all
fixed per-kernel overhead at these leaf sizes (median leaf < 10k elements).

This module performs the SAME math (AdamW b1=0.9 b2=0.999 eps=1e-8,
decoupled weight decay with the _NO_WD_KEYS mask, global-norm clip, LR
schedule — torch parity per qavit_tpu/train/optim.py) on ONE raveled
f32 vector:

  ravel(grads) -> [subtree pre-clip stays per-leaf: few small leaves]
  -> global-norm clip (1 reduction) -> m/v update -> +wd*ravel(params*mask)
  -> *(-lr) -> unravel -> optax.apply_updates

Extra HBM traffic from ravel/unravel is ~150 MB/step (@B=1024: trivial
against the removed kernel-launch overhead).  Exposed as a standard
``optax.GradientTransformation``; the clip happens INSIDE update (steps.py
skips ``apply_clipping`` on this path) and the pre-clip grad norm /
post-update param norm ride in the state so the step's metrics contract
is unchanged.

Reference semantics being replaced: HQAViT_CIFAR100.py:1415-1439
(per-layer clip -> monitored norm -> global clip -> AdamW step).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from qavit_tpu.configs.training import TrainingConfig
from qavit_tpu.train.optim import (_NO_WD_KEYS, _path_str,
                                   lr_group_multipliers, per_tensor_clip)


class FlatAdamWState(NamedTuple):
    count: jax.Array        # int32 step counter (bias correction)
    mu: jax.Array           # [P] f32 first moment, raveled
    nu: jax.Array           # [P] f32 second moment, raveled
    grad_norm: jax.Array    # f32 — pre-global-clip norm (metrics)
    param_norm: jax.Array   # f32 — post-update ||params|| (metrics)


def _all_f32(tree) -> bool:
    return all(l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(tree))


def make_flat_adamw(tc: TrainingConfig,
                    schedule: Callable) -> optax.GradientTransformation:
    """AdamW + two-level clipping on raveled f32 vectors.

    Requires every param/grad leaf to be f32 (the repo's policy: f32
    params, bf16 compute).  ``init`` raises otherwise — callers fall back
    to the per-leaf chain.
    """
    b1, b2, eps = 0.9, 0.999, 1e-8
    mult_fn = lr_group_multipliers(tc)
    pre_clip = (per_tensor_clip(tc.subtree_clip_norm, tc.subtree_clip_keys)
                if tc.subtree_clip_norm is not None else None)

    def init(params):
        if not _all_f32(params):
            raise TypeError("flat AdamW requires all-f32 params; "
                            "use make_optimizer(tc, ..., flat=False)")
        flat, _ = ravel_pytree(params)
        z = jnp.zeros_like(flat, dtype=jnp.float32)
        return FlatAdamWState(count=jnp.zeros((), jnp.int32), mu=z, nu=z,
                              grad_norm=jnp.zeros((), jnp.float32),
                              param_norm=jnp.zeros((), jnp.float32))

    def update(grads, state: FlatAdamWState, params=None):
        assert params is not None, "flat AdamW needs params (weight decay)"
        # 1) subtree pre-clip, per leaf — only the few cnn_stem/dwconv
        #    leaves reduce here (each clipped by its OWN norm, matching
        #    clip_grad_norm_([p], 0.1) — HQAViT_CIFAR100.py:1416-1418)
        if pre_clip is not None:
            grads, _ = pre_clip.update(grads, optax.EmptyState())

        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)

        # 2) global clip: ONE reduction over the flat vector
        grad_norm = jnp.sqrt(jnp.sum(g * g))
        if tc.grad_clip_mode == "norm":
            g = g * jnp.minimum(1.0, tc.max_grad_norm / (grad_norm + 1e-6))
        elif tc.grad_clip_mode == "value":
            g = jnp.clip(g, -tc.max_grad_norm, tc.max_grad_norm)

        # 3) Adam moments + bias correction (optax.scale_by_adam math)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * g * g
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        adam = mu_hat / (jnp.sqrt(nu_hat) + eps)

        # 4) decoupled weight decay with the no-WD mask folded into the
        #    ravel (per-leaf scalar multiply fuses into the concat)
        wd_p, _ = ravel_pytree(jax.tree_util.tree_map_with_path(
            lambda path, p: p if not any(k in _path_str(path)
                                         for k in _NO_WD_KEYS)
            else jnp.zeros_like(p), params))
        step_dir = adam + tc.weight_decay * wd_p

        # 5) LR (+ per-path group multipliers, folded the same way)
        if mult_fn is not None:
            mvec, _ = ravel_pytree(jax.tree_util.tree_map_with_path(
                lambda path, p: jnp.full(p.shape, mult_fn(_path_str(path)),
                                         jnp.float32), params))
            step_dir = step_dir * mvec
        u = -schedule(state.count) * step_dir

        p_flat, _ = ravel_pytree(params)
        param_norm = jnp.sqrt(jnp.sum(jnp.square(p_flat + u)))

        new_state = FlatAdamWState(count=count, mu=mu, nu=nu,
                                   grad_norm=grad_norm,
                                   param_norm=param_norm)
        return unravel(u), new_state

    return optax.GradientTransformation(init, update)


def flat_ema_update(ema_params, params, decay):
    """EMA as one flat fused multiply-add (vs ~487 per-leaf ops).
    Falls back to the per-leaf path on mixed dtypes."""
    if not (_all_f32(ema_params) and _all_f32(params)):
        from qavit_tpu.train.state import ema_update
        return ema_update(ema_params, params, decay)
    e, unravel = ravel_pytree(ema_params)
    p, _ = ravel_pytree(params)
    return unravel(decay * e + (1.0 - decay) * p)


def is_flat_opt_state(opt_state) -> bool:
    return isinstance(opt_state, FlatAdamWState)
