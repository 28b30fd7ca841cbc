"""On-device mixup / cutmix (jit-compatible, jax.random).

Rebuilds the reference's host-side numpy batch mixing
(HQAViT_CIFAR100.py:1339-1408 "hqa" style; QAViTV2_EXTREME.py:1259-1321
"extreme" single-draw style) as in-graph device ops: the bbox patch copy is
an iota mask select, so it runs fused on the VPU instead of on the host.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from qavit_tpu.configs.training import TrainingConfig


class MixedBatch(NamedTuple):
    images: jax.Array     # [B, H, W, C]
    targets_a: jax.Array  # [B]
    targets_b: jax.Array  # [B]
    lam: jax.Array        # scalar in [0, 1]


def _rand_bbox(rng, h: int, w: int, lam):
    """Random bbox covering ~(1-lam) of the image
    (HQAViT_CIFAR100.py:1339-1364)."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (w * cut_rat).astype(jnp.int32)
    cut_h = (h * cut_rat).astype(jnp.int32)
    rx, ry = jax.random.split(rng)
    cx = jax.random.randint(rx, (), 0, w)
    cy = jax.random.randint(ry, (), 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    return x1, y1, x2, y2


def _cutmix(rng, images, targets, alpha: float) -> MixedBatch:
    b, h, w, _ = images.shape
    r_perm, r_lam, r_box = jax.random.split(rng, 3)
    perm = jax.random.permutation(r_perm, b)
    lam0 = jax.random.beta(r_lam, alpha, alpha)
    x1, y1, x2, y2 = _rand_bbox(r_box, h, w, lam0)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = ((row >= y1) & (row < y2) & (col >= x1) & (col < x2))
    mixed = jnp.where(mask[None, :, :, None], images[perm], images)
    # adjust lambda to the exact pixel ratio (HQAViT_CIFAR100.py:1391)
    lam = 1.0 - ((x2 - x1) * (y2 - y1) / (w * h)).astype(jnp.float32)
    return MixedBatch(mixed, targets, targets[perm], lam)


def _mixup(rng, images, targets, alpha: float) -> MixedBatch:
    b = images.shape[0]
    r_perm, r_lam = jax.random.split(rng)
    perm = jax.random.permutation(r_perm, b)
    lam = jax.random.beta(r_lam, alpha, alpha).astype(jnp.float32)
    mixed = lam.astype(images.dtype) * images + \
        (1 - lam).astype(images.dtype) * images[perm]
    return MixedBatch(mixed, targets, targets[perm], lam)


def _identity(images, targets) -> MixedBatch:
    return MixedBatch(images, targets, targets, jnp.float32(1.0))


def apply_mix(rng, images, targets, tc: TrainingConfig) -> MixedBatch:
    """Batch-level mixup/cutmix with the configured policy."""
    if not (tc.use_mixup or tc.use_cutmix):
        return _identity(images, targets)

    r_sel, r_sel2, r_cut, r_mix = jax.random.split(rng, 4)
    cut = lambda: _cutmix(r_cut, images, targets, tc.cutmix_alpha)
    mix = lambda: _mixup(r_mix, images, targets, tc.mixup_alpha)
    ident = lambda: _identity(images, targets)

    if tc.mix_style == "extreme":
        # single uniform draw routed by probability bands
        # (QAViTV2_EXTREME.py:1279-1321)
        u = jax.random.uniform(r_sel)
        branch = jnp.where(
            (u < tc.mixup_prob) & tc.use_mixup, 0,
            jnp.where((u < tc.mixup_prob + tc.cutmix_prob) & tc.use_cutmix,
                      1, 2))
        return jax.lax.switch(branch, [mix, cut, ident])

    # hqa style: independent draws, cutmix first then mixup
    # (HQAViT_CIFAR100.py:1381-1399)
    u1 = jax.random.uniform(r_sel)
    u2 = jax.random.uniform(r_sel2)
    do_cut = jnp.logical_and(tc.use_cutmix, u1 < tc.mix_prob)
    do_mix = jnp.logical_and(tc.use_mixup, u2 < tc.mix_prob)
    branch = jnp.where(do_cut, 0, jnp.where(do_mix, 1, 2))
    return jax.lax.switch(branch, [cut, mix, ident])


def smoothed_cross_entropy(logits, targets, num_classes: int,
                           smoothing: float):
    """CE with label smoothing, matching torch's
    CrossEntropyLoss(label_smoothing=...)."""
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    labels = one_hot * (1.0 - smoothing) + smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(labels * logp).sum(axis=-1)


def mixed_loss(logits, batch: MixedBatch, num_classes: int,
               smoothing: float):
    """lam * CE(a) + (1-lam) * CE(b) (HQAViT_CIFAR100.py:1404-1408)."""
    loss_a = smoothed_cross_entropy(logits, batch.targets_a, num_classes,
                                    smoothing).mean()
    loss_b = smoothed_cross_entropy(logits, batch.targets_b, num_classes,
                                    smoothing).mean()
    return batch.lam * loss_a + (1.0 - batch.lam) * loss_b
