"""Matmul-form depthwise convolution (TPU perf lever, round 5).

XLA lowers a ``feature_group_count=C`` conv on a tiny feature map (the
hybrid stem's ConvNeXt blocks, LMFA and RRCV all operate at 8x8 for the
32px presets) to grouped-conv code that is VPU- and layout-bound — the
"conv fusions" bucket of the step profile (docs/PERF_NOTES.md round-3
decomposition: 25.8 ms of the 118 ms step).  On an HxW map with P = H*W
positions, SAME-padded depthwise conv is exactly a per-channel P x P
doubly-block-Toeplitz matmul:

    y[b, p, c] = sum_q M[p, q, c] * x[b, q, c],
    M[p, q, c] = kernel[dy, dx, 0, c]   where (dy, dx) = pos(q) - pos(p)

M is built each call as one small einsum of a constant 0/1 selector
S[p, k, q] with the kernel taps — differentiable, and the contraction
y = einsum("bqc,pqc->bpc") is MXU-shaped (C-batched P x P matmuls)
instead of a grouped conv.  FLOPs grow by P / (kh*kw) but the op is
nowhere near FLOP-bound at these sizes.

Parameter names and shapes match ``nn.Conv(features=C, (kh, kw),
feature_group_count=C)`` exactly ("kernel" [kh, kw, 1, C], "bias" [C]),
so checkpoints, the torch importer and every parity test see an
identical tree.  Maps larger than ``MATMUL_MAX_POSITIONS`` fall back to
the grouped conv (the selector and FLOP blow-up stop paying).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

# same init as qavit_tpu.nn.layers.conv_init (duplicated: layers.py
# imports this module, so importing back would be circular)
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# 16x16 maps and below use the matmul form; 24x24 (96px stems) and the
# 224 token grids keep the conv lowering.
MATMUL_MAX_POSITIONS = 256


@functools.lru_cache(maxsize=None)
def _selector(h: int, w: int, kh: int, kw: int) -> np.ndarray:
    """Constant 0/1 selector S[p, k, q]: tap k of target position p reads
    source position q (SAME padding; out-of-bounds taps select nothing)."""
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    r = np.arange(h)[:, None, None, None]
    c = np.arange(w)[None, :, None, None]
    rr = r + np.arange(kh)[None, None, :, None] - ph
    cc = c + np.arange(kw)[None, None, None, :] - pw
    valid = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
    q = np.where(valid, rr * w + cc, 0).reshape(h * w, kh * kw)
    s = np.zeros((h * w, kh * kw, h * w), np.float32)
    p_idx = np.repeat(np.arange(h * w), kh * kw)
    s[p_idx, np.tile(np.arange(kh * kw), h * w), q.reshape(-1)] = \
        valid.reshape(-1)
    return s


def dwconv_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise SAME conv of x [B, H, W, C] with kernel [kh, kw, 1, C]
    as a C-batched P x P matmul."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape[:2]
    s = jnp.asarray(_selector(h, w, kh, kw), x.dtype)
    m = jnp.einsum("pkq,kc->pqc", s, kernel.reshape(kh * kw, c).astype(x.dtype))
    y = jnp.einsum("bqc,pqc->bpc", x.reshape(b, h * w, c), m)
    return y.reshape(b, h, w, c)


class MatmulDWConv(nn.Module):
    """Drop-in for ``nn.Conv(C, (k, k), padding="SAME",
    feature_group_count=C)`` with identical parameters; applies the
    matmul form on small maps and the grouped conv otherwise."""

    features: int
    kernel_size: tuple
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", conv_init, (kh, kw, 1, self.features),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        x = x.astype(self.dtype)
        if x.shape[1] * x.shape[2] <= MATMUL_MAX_POSITIONS:
            y = dwconv_matmul(x, kernel)
        else:
            y = lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.features)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
