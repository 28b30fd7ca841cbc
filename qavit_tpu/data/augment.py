"""On-device (jit/vmap) image augmentation.

TPU-native rebuild of the reference's torchvision transform stacks
(SURVEY.md §2.6): instead of host-side PIL workers, the raw uint8 batch is
shipped to HBM once and the whole augmentation pipeline — pad/random-crop,
hflip, rotation, color jitter, RandAugment, normalize, random erasing —
compiles into one fused XLA program, vmapped per image with per-image RNG.

Pipelines match (to distribution, not bitwise — SURVEY.md §7 hard part 4):
* CIFAR-100 HQA 450-ep: crop(32,4), hflip, rot15, jitter(.5,.5,.5,.15)@.9,
  RandAugment(3,10), normalize, erasing(p=.3, scale=(.02,.4))
  (HQAViT_CIFAR100.py:1293-1302)
* DeiT/EXTREME: crop(32,4), hflip, RandAugment(2,9), erasing(.25)
  (QAViTV2_EXTREME.py:1091-1151)
* CIFAR-10 finetune / STL-10 / Tiny-ImageNet variants (HQAViT_Tiny_*.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugConfig:
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    # Resize(resize_to) before everything else (QAViT.py:714: Resize 224)
    resize_to: Optional[int] = None
    crop_pad: int = 4                      # RandomCrop(size, padding)
    hflip: bool = True
    rotation_deg: float = 0.0              # RandomRotation(degrees)
    jitter: Optional[Tuple[float, float, float, float]] = None  # b,c,s,h
    jitter_prob: float = 1.0
    randaug_ops: int = 0
    randaug_magnitude: int = 0
    erasing_prob: float = 0.0
    erasing_scale: Tuple[float, float] = (0.02, 0.33)
    erasing_ratio: Tuple[float, float] = (0.3, 3.3)
    # RandomApply(GaussianBlur(kernel, sigma=(0.1, 2))) — STL pipeline
    # (HQAViT_Tiny_stl10.py:193)
    blur_prob: float = 0.0
    blur_kernel: int = 3
    # RandomResizedCrop for STL/SimCLR (scale range); None = plain crop
    rrc_scale: Optional[Tuple[float, float]] = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _resample_x(img, src_x):
    """Resample along x with per-output source coords ``src_x [H, W]``:
    ``out[y, x] = sum_u relu(1 - |src_x[y, x] - u|) * img[y, u]``.

    The bilinear weights form a dense [H, W, W] tensor consumed by ONE
    einsum — an MXU matmul.  The naive formulation (flat per-pixel
    gathers) runs at ~2% lane utilisation on TPU and dominated the whole
    train step (46.8 ms per gather at B=256, 84% of the fused-chunk
    profile); the matmul form is ~100x cheaper.  Sources outside
    [0, W-1] fade to zero exactly like the zero-fill gather did.
    img: [H, W, C] float."""
    h, w, _ = img.shape
    u = jnp.arange(w, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(src_x[..., None] - u))
    return jnp.einsum("yxu,yuc->yxc", wgt, img,
                      preferred_element_type=jnp.float32)


def _resample_y(img, src_y):
    """Resample along y (see :func:`_resample_x`).  src_y: [H, W]."""
    h, w, _ = img.shape
    v = jnp.arange(h, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(src_y[..., None] - v))
    return jnp.einsum("yxv,vxc->yxc", wgt, img,
                      preferred_element_type=jnp.float32)


def _grid(h, w):
    yy = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xx = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    return jnp.meshgrid(yy, xx, indexing="ij")


def _shear_x(img, mag):
    """out(y, x) <- in(y, x + mag*y) around the centre (x-separable)."""
    h, w, _ = img.shape
    gy, gx = _grid(h, w)
    return _resample_x(img, gx + mag * gy + (w - 1) / 2)


def _shear_y(img, mag):
    h, w, _ = img.shape
    gy, gx = _grid(h, w)
    return _resample_y(img, gy + mag * gx + (h - 1) / 2)


def rotate(img, deg):
    """Paeth 3-shear rotation: R(t) = Sx(-tan(t/2)) Sy(sin t)
    Sx(-tan(t/2)) — every pass is a separable matmul resample.  For the
    |t| <= 15 deg range the aug pipelines use, the triple-bilinear result
    is visually identical to direct bilinear rotation (and exactly
    area-preserving)."""
    rad = deg * jnp.pi / 180.0
    # inverse-map composition: Mx(a)·My(b)·Mx(a) = [[cos, sin], [-sin,
    # cos]] exactly when a = tan(t/2), b = -sin(t)
    a = jnp.tan(rad / 2.0)
    b = -jnp.sin(rad)
    return _shear_x(_shear_y(_shear_x(img, a), b), a)


def shear_x(img, mag):
    return _shear_x(img, mag)


def shear_y(img, mag):
    return _shear_y(img, mag)


def translate_x(img, pixels):
    h, w, _ = img.shape
    gy, gx = _grid(h, w)
    return _resample_x(img, gx + pixels + (w - 1) / 2)


def translate_y(img, pixels):
    h, w, _ = img.shape
    gy, gx = _grid(h, w)
    return _resample_y(img, gy + pixels + (h - 1) / 2)


def random_crop(rng, img, pad: int):
    """RandomCrop(size, padding=pad) with zero padding."""
    h, w, c = img.shape
    padded = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)))
    ry, rx = jax.random.split(rng)
    oy = jax.random.randint(ry, (), 0, 2 * pad + 1)
    ox = jax.random.randint(rx, (), 0, 2 * pad + 1)
    return jax.lax.dynamic_slice(padded, (oy, ox, 0), (h, w, c))


def random_resized_crop(rng, img, scale: Tuple[float, float]):
    """RandomResizedCrop to the same size (aspect ratio 3/4..4/3)."""
    h, w, c = img.shape
    r_area, r_ratio, r_y, r_x = jax.random.split(rng, 4)
    area = jax.random.uniform(r_area, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(r_ratio, (), minval=jnp.log(3 / 4),
                                   maxval=jnp.log(4 / 3))
    ratio = jnp.exp(log_ratio)
    ch = jnp.sqrt(area / ratio) * h
    cw = jnp.sqrt(area * ratio) * w
    ch = jnp.clip(ch, 1.0, h)
    cw = jnp.clip(cw, 1.0, w)
    oy = jax.random.uniform(r_y, ()) * (h - ch)
    ox = jax.random.uniform(r_x, ()) * (w - cw)
    # sample the crop back to full resolution: scale+translate is
    # axis-separable -> two matmul resamples
    gy, gx = _grid(h, w)
    img = _resample_x(img, (cw / w) * gx + ox + (cw - 1) / 2)
    return _resample_y(img, (ch / h) * gy + oy + (ch - 1) / 2)


def hflip(rng, img):
    return jnp.where(jax.random.bernoulli(rng), img[:, ::-1], img)


# ---------------------------------------------------------------------------
# photometric ops (inputs in [0, 255] float)
# ---------------------------------------------------------------------------

def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 255.0)


def _grayscale(img):
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    mean = _grayscale(img).mean()
    return _blend(img, jnp.full_like(img, mean), factor)


def adjust_saturation(img, factor):
    return _blend(img, jnp.broadcast_to(_grayscale(img), img.shape), factor)


def adjust_hue(img, delta):
    """Hue rotation by ``delta`` (fraction of the color wheel, [-0.5, .5])."""
    x = img / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    diff = mx - mn + 1e-8
    h = jnp.where(
        mx == r, (g - b) / diff,
        jnp.where(mx == g, 2.0 + (b - r) / diff, 4.0 + (r - g) / diff))
    h = (h / 6.0) % 1.0
    s = jnp.where(mx > 0, diff / (mx + 1e-8), 0.0)
    v = mx
    h = (h + delta) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v, v, q])
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1) * 255.0, 0.0, 255.0)


def autocontrast(img):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
    offs = jnp.where(hi > lo, -lo * scale, 0.0)
    return jnp.clip(img * scale + offs, 0.0, 255.0)


def equalize(img):
    """PIL-style histogram equalization, per channel (uint8 semantics)."""

    def eq_channel(ch):
        # One-hot formulation: the histogram is a reduction of the
        # [pixels, 256] bin-indicator matrix and the LUT apply is a
        # matvec against it — no scatter, no per-pixel gather (each was
        # a ~40 ms serialized op per batch on TPU; the one-hot runs on
        # the VPU/MXU in <1 ms).
        chi = jnp.clip(ch, 0, 255).astype(jnp.int32).reshape(-1)
        oh = (chi[:, None] == jnp.arange(256)[None]).astype(jnp.float32)
        histo = oh.sum(0).astype(jnp.int32)
        # last nonzero bin
        idx = 255 - jnp.argmax((histo > 0)[::-1])
        step = (histo.sum() - histo[idx]) // 255
        lut = (jnp.cumsum(histo) + step // 2) // jnp.maximum(step, 1)
        lut = jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]])
        lut = jnp.clip(lut, 0, 255).astype(jnp.float32)
        out = (oh @ lut).reshape(ch.shape).astype(ch.dtype)
        return jnp.where(step == 0, ch, out)

    return jnp.stack([eq_channel(img[..., c]) for c in range(3)], axis=-1)


def posterize(img, bits):
    mask = (0xFF << (8 - bits)) & 0xFF
    return (img.astype(jnp.int32) & mask).astype(img.dtype)


def solarize(img, threshold):
    return jnp.where(img >= threshold, 255.0 - img, img)


def sharpness(img, factor):
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.broadcast_to(kernel, (3, 1, 3, 3)).reshape(3, 1, 3, 3),
        (1, 1), "SAME", feature_group_count=3)[0].transpose(1, 2, 0)
    # PIL keeps the border pixels unchanged
    h, w, _ = img.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    border = ((yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1))
    blurred = jnp.where(border[..., None], img, blurred)
    return _blend(img, blurred, factor)


# ---------------------------------------------------------------------------
# RandAugment (torchvision's 14-op space, magnitude bins 0..30)
# ---------------------------------------------------------------------------

def _randaug_apply(rng, img, op_idx, magnitude: float):
    r_sign = jax.random.bernoulli(rng)
    sign = jnp.where(r_sign, 1.0, -1.0)
    frac = magnitude / 30.0
    h = img.shape[0]

    branches = [
        lambda im: im,                                         # identity
        lambda im: shear_x(im, sign * 0.3 * frac),
        lambda im: shear_y(im, sign * 0.3 * frac),
        lambda im: translate_x(im, sign * frac * 150.0 / 331.0 * h),
        lambda im: translate_y(im, sign * frac * 150.0 / 331.0 * h),
        lambda im: rotate(im, sign * 30.0 * frac),
        lambda im: adjust_brightness(im, 1.0 + sign * 0.9 * frac),
        lambda im: adjust_saturation(im, 1.0 + sign * 0.9 * frac),  # "Color"
        lambda im: adjust_contrast(im, 1.0 + sign * 0.9 * frac),
        lambda im: sharpness(im, 1.0 + sign * 0.9 * frac),
        lambda im: posterize(
            im, jnp.int32(8 - jnp.round(frac * 4).astype(jnp.int32))),
        lambda im: solarize(im, 255.0 * (1.0 - frac)),
        lambda im: autocontrast(im),
        lambda im: equalize(im),
    ]
    return jax.lax.switch(op_idx, branches, img)


def rand_augment(rng, img, num_ops: int, magnitude: int):
    """img: [H, W, 3] float in [0, 255]."""
    for i in range(num_ops):
        rng, r_op, r_apply = jax.random.split(rng, 3)
        op_idx = jax.random.randint(r_op, (), 0, 14)
        img = _randaug_apply(r_apply, img, op_idx, float(magnitude))
    return img


def gaussian_blur(rng, img, kernel_size: int = 3,
                  sigma_range=(0.1, 2.0)):
    """Separable Gaussian blur with random sigma (torchvision
    GaussianBlur semantics)."""
    sigma = jax.random.uniform(rng, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    r = kernel_size // 2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    k = k / k.sum()
    c = img.shape[-1]
    x = img[None].transpose(0, 3, 1, 2)          # [1, C, H, W]
    kh = jnp.broadcast_to(k.reshape(1, 1, kernel_size, 1),
                          (c, 1, kernel_size, 1))
    kw = jnp.broadcast_to(k.reshape(1, 1, 1, kernel_size),
                          (c, 1, 1, kernel_size))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME",
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME",
                                     feature_group_count=c)
    return x[0].transpose(1, 2, 0)


# ---------------------------------------------------------------------------
# erasing + normalize
# ---------------------------------------------------------------------------

def random_erasing(rng, img, prob: float, scale: Tuple[float, float],
                   ratio: Tuple[float, float]):
    """RandomErasing(value='random') on the normalized tensor
    (HQAViT_CIFAR100.py:1301)."""
    h, w, c = img.shape
    r_do, r_area, r_ratio, r_y, r_x, r_val = jax.random.split(rng, 6)
    area = h * w * jax.random.uniform(r_area, (), minval=scale[0],
                                      maxval=scale[1])
    log_ratio = jax.random.uniform(r_ratio, (), minval=jnp.log(ratio[0]),
                                   maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.sqrt(area * aspect), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(area / aspect), 1, w).astype(jnp.int32)
    oy = jax.random.randint(r_y, (), 0, h)
    ox = jax.random.randint(r_x, (), 0, w)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    mask = ((yy >= oy) & (yy < oy + eh) & (xx >= ox) & (xx < ox + ew))
    noise = jax.random.normal(r_val, img.shape, img.dtype)
    erased = jnp.where(mask[..., None], noise, img)
    return jnp.where(jax.random.bernoulli(r_do, prob), erased, img)


def normalize(img01, mean, std):
    mean = jnp.asarray(mean, img01.dtype)
    std = jnp.asarray(std, img01.dtype)
    return (img01 - mean) / std


# ---------------------------------------------------------------------------
# full pipelines
# ---------------------------------------------------------------------------

def augment_image(rng, img_u8, cfg: AugConfig):
    """Augment a single [H, W, 3] uint8 image (jit/vmap/scan-safe)."""
    img = img_u8.astype(jnp.float32)       # [0, 255]
    if cfg.resize_to is not None:
        r = cfg.resize_to
        img = jax.image.resize(img, (r, r, img.shape[-1]), method="bilinear")
    if cfg.rrc_scale is not None:
        rng, r = jax.random.split(rng)
        img = random_resized_crop(r, img, cfg.rrc_scale)
    elif cfg.crop_pad > 0:
        rng, r = jax.random.split(rng)
        img = random_crop(r, img, cfg.crop_pad)
    if cfg.hflip:
        rng, r = jax.random.split(rng)
        img = hflip(r, img)
    if cfg.rotation_deg > 0:
        rng, r = jax.random.split(rng)
        deg = jax.random.uniform(r, (), minval=-cfg.rotation_deg,
                                 maxval=cfg.rotation_deg)
        img = rotate(img, deg)
    if cfg.jitter is not None:
        b, c, s, hta = cfg.jitter
        rng, r_do, rb, rc, rs, rh = jax.random.split(rng, 6)

        def jit_img(im):
            if b > 0:
                fb = jax.random.uniform(rb, (), minval=max(0.0, 1 - b),
                                        maxval=1 + b)
                im = adjust_brightness(im, fb)
            if c > 0:
                fc = jax.random.uniform(rc, (), minval=max(0.0, 1 - c),
                                        maxval=1 + c)
                im = adjust_contrast(im, fc)
            if s > 0:
                fs = jax.random.uniform(rs, (), minval=max(0.0, 1 - s),
                                        maxval=1 + s)
                im = adjust_saturation(im, fs)
            if hta > 0:
                fh = jax.random.uniform(rh, (), minval=-hta, maxval=hta)
                im = adjust_hue(im, fh)
            return im

        do = jax.random.bernoulli(r_do, cfg.jitter_prob)
        img = jnp.where(do, jit_img(img), img)
    if cfg.randaug_ops > 0:
        rng, r = jax.random.split(rng)
        img = rand_augment(r, img, cfg.randaug_ops, cfg.randaug_magnitude)
    if cfg.blur_prob > 0:
        rng, r_do, r_sig = jax.random.split(rng, 3)
        blurred = gaussian_blur(r_sig, img, cfg.blur_kernel)
        img = jnp.where(jax.random.bernoulli(r_do, cfg.blur_prob), blurred,
                        img)
    img = normalize(img / 255.0, cfg.mean, cfg.std)
    if cfg.erasing_prob > 0:
        rng, r = jax.random.split(rng)
        img = random_erasing(r, img, cfg.erasing_prob, cfg.erasing_scale,
                             cfg.erasing_ratio)
    return img


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(rng, images_u8, cfg: AugConfig):
    """uint8 [B, H, W, 3] -> normalized float32 [B, H, W, 3], one fused
    XLA program, per-image RNG streams."""
    rngs = jax.random.split(rng, images_u8.shape[0])
    return jax.vmap(lambda r, im: augment_image(r, im, cfg))(rngs, images_u8)


@partial(jax.jit, static_argnames=("cfg",))
def eval_batch(images_u8, cfg: AugConfig):
    """Validation path: [resize +] normalize
    (HQAViT_CIFAR100.py:1304-1307; QAViT.py:722-726)."""
    img = images_u8.astype(jnp.float32)
    if cfg.resize_to is not None:
        b, h, w, c = img.shape
        r = cfg.resize_to
        img = jax.image.resize(img, (b, r, r, c), method="bilinear")
    return normalize(img / 255.0, cfg.mean, cfg.std)
