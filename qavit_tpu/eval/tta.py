"""Test-time augmentation: the reference's EXACT 5-transform ensemble
(HQAViT_C100_Finetune.py:106-132):

    1. identity (ToTensor + Normalize)
    2. RandomHorizontalFlip(p=1.0)           -> deterministic flip
    3. RandomCrop(size, padding=2)           -> random offsets per image
    4. HFlip(p=1.0) then RandomCrop(size, 2) -> flip first (Compose order)
    5. ColorJitter(brightness=0.1)           -> factor ~ U[0.9, 1.1]/image

Randomized transforms draw fresh offsets/factors per image per batch (the
reference uses torch's global RNG; this is the distributional-parity JAX
analogue keyed on a counter so batches differ).  Probabilities from all
five views are softmax-averaged in :func:`qavit_tpu.eval.validate_tta`.
"""

from __future__ import annotations

import itertools
from typing import Callable, List

import jax
import jax.numpy as jnp


def make_tta_preprocessors(aug_cfg, seed: int = 0) -> List[Callable]:
    """Build the 5 reference TTA preprocessors.

    Each returned callable maps a uint8 image batch [B, H, W, 3] to a
    normalised float batch; randomized ones advance an internal per-batch
    counter so consecutive batches get fresh draws.
    """
    from qavit_tpu.data.augment import normalize, random_crop

    def norm(img255):
        return normalize(img255.astype(jnp.float32) / 255.0,
                         aug_cfg.mean, aug_cfg.std)

    def identity(rng, img):
        return norm(img)

    def flip(rng, img):
        return norm(img[:, :, ::-1])

    def crop(rng, img):
        rngs = jax.random.split(rng, img.shape[0])
        img = img.astype(jnp.float32)
        return norm(jax.vmap(lambda r, im: random_crop(r, im, 2))(rngs, img))

    def flip_crop(rng, img):
        # Compose order: flip first, then the random crop
        return crop(rng, img[:, :, ::-1])

    def bright(rng, img):
        # ColorJitter(brightness=0.1): scale ~ U[0.9, 1.1], clamp to range
        f = jax.random.uniform(rng, (img.shape[0], 1, 1, 1),
                               minval=0.9, maxval=1.1)
        return norm(jnp.clip(img.astype(jnp.float32) * f, 0.0, 255.0))

    base = jax.random.PRNGKey(seed)

    def stateful(fn, idx):
        jitted = jax.jit(fn)
        counter = itertools.count()

        def prep(images_u8):
            rng = jax.random.fold_in(jax.random.fold_in(base, idx),
                                     next(counter))
            return jitted(rng, images_u8)

        return prep

    return [stateful(fn, i)
            for i, fn in enumerate((identity, flip, crop, flip_crop,
                                    bright))]
