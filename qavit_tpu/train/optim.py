"""Optimizer construction: AdamW + schedules + the reference's two-level
gradient clipping and finetune LR-group policies, as optax transforms.

Rebuilds:
* AdamW + OneCycleLR (QAViT.py:884-904, HQAViT_CIFAR100.py:1566-1586)
* CosineAnnealing + linear warmup (HQAViT_Tiny_Cifar10.py:482-494)
* CosineAnnealingWarmRestarts (HQAViT_C100_Finetune.py:435-446)
* per-tensor pre-clip of cnn_stem/dwconv grads to 0.1 before the global
  clip (HQAViT_CIFAR100.py:1415-1434)
* layer-wise / differential LR groups (HQAViT_C100_Finetune.py:188-227,
  HQAViT_Tiny_Cifar10.py:327-342)
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from qavit_tpu.configs.training import TrainingConfig

# Params that never receive gradients in torch (their outputs feed only
# the bank write path, which is all ``.data`` ops): the bank write
# projections (qavit_tpu/nn/bank.py) AND each writing branch's post-proj
# LayerNorm (``self.norm(output)`` feeds only ``global_bank.write``,
# QAViT.py:362).  torch's AdamW skips None-grad params entirely, so they
# must be masked out of optax's decoupled weight decay too — otherwise
# they decay toward zero over a long run with zero gradients.
_NO_WD_KEYS = ("write_norm", "write_compression", "write_gate",
               "swa/norm/", "msda/norm/", "cga/norm/")


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def make_schedule(tc: TrainingConfig, steps_per_epoch: int) -> Callable:
    total = max(steps_per_epoch * tc.epochs, 2)
    # smoke runs can truncate epochs below the warmup; keep schedules valid
    warmup = min(steps_per_epoch * tc.warmup_epochs, total - 1)
    if tc.schedule == "onecycle":
        # OneCycleLR(cos anneal, pct_start=warmup/total, div_factor,
        # final_div_factor) — QAViT.py:896-904.  At least ONE warmup step:
        # pct_start ~ 0 makes the warmup interpolation 0/0 -> NaN LR.
        return optax.cosine_onecycle_schedule(
            transition_steps=total,
            peak_value=tc.base_lr,
            pct_start=max(warmup, 1) / total,
            div_factor=tc.onecycle_div_factor,
            final_div_factor=tc.onecycle_final_div,
        )
    if tc.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=tc.base_lr / tc.onecycle_div_factor,
            peak_value=tc.base_lr,
            warmup_steps=warmup,
            decay_steps=total,
            end_value=tc.min_lr,
        )
    if tc.schedule == "warm_restarts":
        # SGDR cosine restarts (T_0, T_mult) after a linear warmup
        t0 = steps_per_epoch * tc.warm_restart_t0_epochs
        t_mult = tc.warm_restart_t_mult

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm = tc.base_lr * jnp.minimum(step / jnp.maximum(warmup, 1), 1.0)
            s = jnp.maximum(step - warmup, 0.0)
            if t_mult == 1:
                t_cur = jnp.mod(s, t0)
                t_i = float(t0)
            else:
                # cycle k covers [t0*(m^k-1)/(m-1), t0*(m^{k+1}-1)/(m-1))
                ratio = s * (t_mult - 1) / t0 + 1
                k = jnp.floor(jnp.log(ratio) / math.log(t_mult))
                start = t0 * (t_mult ** k - 1) / (t_mult - 1)
                t_i = t0 * t_mult ** k
                t_cur = s - start
            cos = 0.5 * (1 + jnp.cos(jnp.pi * t_cur / t_i))
            restart = tc.min_lr + (tc.base_lr - tc.min_lr) * cos
            return jnp.where(step < warmup, warm, restart)

        return schedule
    raise ValueError(f"unknown schedule {tc.schedule!r}")


def per_tensor_clip(max_norm: float,
                    keys: Sequence[str]) -> optax.GradientTransformation:
    """Clip each matching parameter's gradient to ``max_norm`` by its own
    norm — the JAX analogue of looping ``clip_grad_norm_([param], 0.1)``
    over cnn_stem/dwconv params (HQAViT_CIFAR100.py:1416-1418)."""

    def update_fn(updates, state, params=None):
        del params

        def clip_leaf(path, g):
            if not any(k in _path_str(path) for k in keys):
                return g
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
            return (g * scale).astype(g.dtype)

        return jax.tree_util.tree_map_with_path(clip_leaf, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def lr_group_multipliers(tc: TrainingConfig) -> Optional[Callable[[str], float]]:
    """Per-parameter LR multiplier by pytree path."""
    if tc.lr_groups is None:
        return None
    if tc.lr_groups == "differential":
        # backbone base LR, head x multiplier (HQAViT_Tiny_Cifar10.py:327)
        return lambda p: tc.head_lr_multiplier if "head" in p else 1.0
    if tc.lr_groups == "layerwise":
        # HQAViT_C100_Finetune.py:188-227 — first match wins, in this order
        def mult(p: str) -> float:
            if "head" in p:
                return tc.head_lr_multiplier
            for stage in (4, 3, 2, 1):
                if f"stage{stage}" in p:
                    return tc.layer_lr_decay ** (4 - stage)
            if any(k in p for k in ("fuse", "rrcv", "lmfa")):
                return 0.5
            if "cnn_stem" in p:
                return 0.1
            if any(k in p for k in ("patch_embed", "pos_embed",
                                    "global_bank")):
                return 0.3
            return 1.0

        return mult
    raise ValueError(f"unknown lr_groups {tc.lr_groups!r}")


def scale_by_lr_groups(mult_fn) -> optax.GradientTransformation:
    def update_fn(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * mult_fn(_path_str(path)), updates)
        return scaled, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def apply_clipping(grads, tc: TrainingConfig):
    """The reference's two-level clipping, applied in the train step:
    per-tensor pre-clip of cnn_stem/dwconv -> monitor norm -> global clip
    (HQAViT_CIFAR100.py:1415-1434).  Computing the global norm ONCE here
    and sharing it between the metric and the clip saves ~600 per-leaf
    reductions per step vs a chained optax.clip_by_global_norm.

    Returns (clipped_grads, pre-global-clip grad norm).
    """
    if tc.subtree_clip_norm is not None:
        clip = per_tensor_clip(tc.subtree_clip_norm, tc.subtree_clip_keys)
        grads, _ = clip.update(grads, optax.EmptyState())
    grad_norm = optax.global_norm(grads)
    if tc.grad_clip_mode == "norm":
        scale = jnp.minimum(1.0, tc.max_grad_norm / (grad_norm + 1e-6))
        grads = jax.tree.map(lambda g: (g * scale).astype(g.dtype), grads)
    elif tc.grad_clip_mode == "value":
        grads = jax.tree.map(
            lambda g: jnp.clip(g, -tc.max_grad_norm, tc.max_grad_norm),
            grads)
    return grads, grad_norm


def make_optimizer(tc: TrainingConfig, steps_per_epoch: int,
                   schedule: Optional[Callable] = None
                   ) -> optax.GradientTransformation:
    """The post-clipping update chain: Adam -> decoupled weight decay ->
    LR-group scaling -> learning rate.  Clipping happens in the train
    step via :func:`apply_clipping` (matching the reference's ordering:
    per-tensor clip -> monitored norm -> global clip -> step)."""
    if schedule is None:
        schedule = make_schedule(tc, steps_per_epoch)

    if getattr(tc, "flat_optimizer", False):
        # the raveled-vector fast path owns clipping too — the train step
        # skips apply_clipping when tc.flat_optimizer is set
        from qavit_tpu.train.flat_optim import make_flat_adamw
        return make_flat_adamw(tc, schedule)

    chain = []
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))

    def wd_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(k in _path_str(path)
                                    for k in _NO_WD_KEYS), params)

    chain.append(optax.add_decayed_weights(tc.weight_decay, mask=wd_mask))

    mult_fn = lr_group_multipliers(tc)
    if mult_fn is not None:
        chain.append(scale_by_lr_groups(mult_fn))

    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
