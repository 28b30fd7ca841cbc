"""Grad-CAM on the patch-embedding activations.

Rebuilds test_hqa.py:229-354: the reference forward-hooks
``model.patch_embed.proj`` — the conv projection output BEFORE the
embedding LayerNorm.  PatchEmbed exposes a zero *perturbation* at exactly
that point (nn/layers.py), so ``jax.grad`` w.r.t. the perturbation IS the
hook gradient and the hooked activation is the pre-norm projection — no
mutation, fully jittable, same hook point as the reference.

cam = ReLU(sum_c mean_grad_c * act_c), min-max normalised, bilinearly
upsampled, jet colormap + 0.5-alpha overlay; batch driver writes
``gradcam_{idx}_pred{p}_true{t}_{heat,overlay}.png`` exactly like the
reference (gradcam_hqa/ artifact layout).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qavit_tpu.nn.layers import PatchEmbed


def _patch_activation(model_cfg, params, image):
    """Recompute the hooked tensor: the patch projection PRE-norm
    (= model.patch_embed.proj output, test_hqa.py:243)."""
    pe = PatchEmbed(model_cfg.patch_size, model_cfg.embed_dim,
                    dtype=jnp.float32)
    return pe.apply({"params": params["patch_embed"]}, image,
                    pre_norm=True)


def grad_cam(model, variables, image, class_idx: Optional[int] = None,
             bank_count=0) -> Tuple[np.ndarray, int]:
    """Compute a Grad-CAM heatmap for one image.

    Args:
      image: [H, W, 3] normalised float input.
    Returns:
      (cam [H, W] float in [0,1], predicted-or-requested class index)
    """
    cfg = model.cfg
    x = image[None]
    n, c = cfg.num_patches, cfg.embed_dim
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    zeros = jnp.zeros((1, n, c), dtype)

    base_vars = {k: v for k, v in variables.items() if k != "perturbations"}

    def score(pert, cls):
        v = dict(base_vars)
        v["perturbations"] = {"patch_embed": {"patch_tokens": pert}}
        logits, _ = model.apply(v, x, train=False, bank_count=bank_count)
        return logits[0, cls], logits

    logits_only = model.apply(base_vars, x, train=False,
                              bank_count=bank_count)[0]
    cls = int(class_idx if class_idx is not None
              else jnp.argmax(logits_only[0]))

    grads, _ = jax.grad(score, has_aux=True)(zeros, cls)
    grads = grads.astype(jnp.float32)
    acts = _patch_activation(cfg, variables["params"], x)    # [1, N, C]

    # weights = mean gradient per channel over the spatial axis
    weights = grads[0].mean(axis=0)                          # [C]
    cam = jnp.maximum((acts[0] * weights).sum(axis=-1), 0.0)  # [N]
    g = int(math.isqrt(n))
    cam = cam.reshape(g, g)
    cam = cam - cam.min()
    cam = cam / (cam.max() + 1e-8)
    h, w = image.shape[:2]
    cam = jax.image.resize(cam, (h, w), method="bilinear")
    return np.asarray(cam), cls


def save_gradcam_overlay(cam: np.ndarray, image_u8: np.ndarray,
                         out_prefix: str) -> Tuple[str, str]:
    """Jet-colormap heatmap + 0.5-alpha overlay PNGs
    (test_hqa.py:281-318)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.cm as cm
    from PIL import Image

    heat = (cm.jet(cam)[..., :3] * 255).astype(np.uint8)
    overlay = (0.5 * heat + 0.5 * image_u8).astype(np.uint8)
    heat_path = f"{out_prefix}_heat.png"
    over_path = f"{out_prefix}_overlay.png"
    Image.fromarray(heat).save(heat_path)
    Image.fromarray(overlay).save(over_path)
    return heat_path, over_path


def gradcam_on_batch(model, variables, images_norm, images_u8, labels,
                     out_dir: str, max_images: int = 30) -> list:
    """Batch driver mirroring gradcam_on_loader (test_hqa.py:322-354)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for idx in range(min(len(images_norm), max_images)):
        cam, pred = grad_cam(model, variables, images_norm[idx])
        true = int(labels[idx])
        prefix = out_dir / f"gradcam_{idx}_pred{pred}_true{true}"
        written.append(save_gradcam_overlay(cam, np.asarray(images_u8[idx]),
                                            str(prefix)))
    return written
