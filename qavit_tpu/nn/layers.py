"""Shared primitive layers for the QA-ViT family.

Functional flax re-designs of the reference's primitives (drop_path
QAViT.py:161, LinformerCompression QAViT.py:227, PatchEmbed QAViT.py:642,
HybridFusion/BottleneckMLP/DepthwiseConv2d/CCFFFN QAViT.py:526-582 and the
stabilised v2 forms HQAViT_CIFAR100.py:659-712).

Layout conventions: tokens are ``[B, N, C]``, images/feature maps are NHWC.
All modules take a compute ``dtype`` (bf16 on TPU) with fp32 params — the
TPU replacement for CUDA AMP autocast.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch's trunc_normal_(std=0.02) truncates at absolute +-2 (i.e. +-100
# sigma) so it is effectively a plain normal; the reference re-initialises
# every Linear with it via model.apply(_init_weights) (QAViT.py:678-687).
dense_init = nn.initializers.normal(stddev=0.02)
# kaiming_normal(mode='fan_out', nonlinearity='relu') for every Conv2d
# (QAViT.py:686-687).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch LayerNorm default eps
LN_EPS = 1e-5


class DropPath(nn.Module):
    """Stochastic depth: per-sample Bernoulli mask scaled by 1/keep_prob
    (reference: QAViT.py:161-177).

    ``rate`` may be a traced scalar so block stacks can be ``nn.scan``-ned
    with per-depth rates supplied as scan inputs.
    """

    @nn.compact
    def __call__(self, x, rate, train: bool = False):
        if not train or (isinstance(rate, float) and rate == 0.0):
            return x
        keep_prob = 1.0 - jnp.asarray(rate, jnp.float32)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep_prob, shape)
        return jnp.where(mask, x / keep_prob.astype(x.dtype), 0.0).astype(
            x.dtype)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding + LayerNorm (QAViT.py:642-651).

    Implemented as reshape + Dense: a stride=patch conv is exactly a matmul
    on TPU, and expressing it as one guarantees MXU mapping.

    The Grad-CAM hook sits on the *pre-norm* projection output — exactly
    where the reference forward-hooks ``model.patch_embed.proj``
    (test_hqa.py:243-257): a zero perturbation (shape [1, N, C], broadcast
    over batch) whose gradient is d(score)/d(activation).
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pre_norm: bool = False):
        # x: [B, H, W, Cin]
        b, h, w, cin = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, cin)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * cin)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, kernel_init=conv_init,
                     name="proj")(x)
        x = (x + self.perturb(
            "patch_tokens",
            jnp.zeros((1,) + x.shape[1:], x.dtype))).astype(self.dtype)
        if pre_norm:
            return x  # the hooked activation (conv output before LN)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        return x  # [B, N, C]


class LinformerCompression(nn.Module):
    """Learned sequence-length projection of K/V (QAViT.py:227-256).

    Pads or truncates the key axis to ``seq_len`` first, then projects it
    to ``compressed_len`` with learned E_k / E_v.
    """

    seq_len: int
    compressed_len: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, k, v) -> Tuple[jax.Array, jax.Array]:
        # k, v: [B, N, H, D] (token axis second — see kernels/attention.py)
        n = k.shape[1]
        if n < self.seq_len:
            pad = ((0, 0), (0, self.seq_len - n), (0, 0), (0, 0))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        elif n > self.seq_len:
            k = k[:, : self.seq_len]
            v = v[:, : self.seq_len]
        e_k = self.param("E_k", nn.initializers.normal(0.02),
                         (self.seq_len, self.compressed_len))
        e_v = self.param("E_v", nn.initializers.normal(0.02),
                         (self.seq_len, self.compressed_len))
        e_k = e_k.astype(self.dtype)
        e_v = e_v.astype(self.dtype)
        k_c = jnp.einsum("nm,bnhd->bmhd", e_k, k.astype(self.dtype))
        v_c = jnp.einsum("nm,bnhd->bmhd", e_v, v.astype(self.dtype))
        return k_c, v_c


class HybridFusion(nn.Module):
    """Softmax-weighted concat of branch outputs (QAViT.py:526-534)."""

    num_branches: int = 4

    @nn.compact
    def __call__(self, branches):
        w = self.param("fusion_weights", nn.initializers.ones,
                       (self.num_branches,))
        w = jax.nn.softmax(w.astype(jnp.float32))
        scaled = [b * w[i].astype(b.dtype) for i, b in enumerate(branches)]
        return jnp.concatenate(scaled, axis=-1)


class BottleneckMLP(nn.Module):
    """Linear -> GELU -> drop -> Linear -> drop (QAViT.py:537-550)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=dense_init, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     kernel_init=dense_init, name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class DepthwiseConv2d(nn.Module):
    """Depthwise 3x3 over a [B, N, C] token grid (QAViT.py:553-562; the
    stabilised v2 form HQAViT_CIFAR100.py:659-675 drops the bias and adds a
    learnable per-channel 0.1 scale).

    Note the v2 reference also re-initialises the kernel kaiming/sqrt(dim)
    but then overwrites it with plain kaiming via the model-level
    ``_init_weights`` pass (HQAViT_CIFAR100.py:1213-1224), so effective
    init is kaiming fan_out either way — we reproduce the effective init.
    """

    dim: int
    kernel_size: int = 3
    stabilized: bool = True
    # QAViTv2.py:861 keeps bias=True in its stabilised form; the 32px v2
    # files use bias=False (QAViTv2_CIFAR100.py:885).  v1 always has bias.
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        b, n, c = x.shape
        h, w = hw
        y = x.reshape(b, h, w, c)
        from qavit_tpu.nn.dwconv import MatmulDWConv
        y = MatmulDWConv(c, (self.kernel_size, self.kernel_size),
                         use_bias=self.use_bias or not self.stabilized,
                         dtype=self.dtype, name="dwconv")(y)
        if self.stabilized:
            scale = self.param("scale",
                               nn.initializers.constant(0.1), (c,))
            y = y * scale.astype(y.dtype)
        return y.reshape(b, n, c)


class CCFFFN(nn.Module):
    """Conv-enhanced FFN: fc1 -> GELU -> [LN] -> dwconv -> [LN] -> fc2
    (QAViT.py:565-582; stabilised form with pre/post LN and learnable
    residual gain gamma=0.1, HQAViT_CIFAR100.py:678-712)."""

    embed_dim: int
    mlp_ratio: float = 0.5
    dropout: float = 0.1
    stabilized: bool = True
    stabilized_dwconv: bool = True
    dwconv_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        hw = int(math.isqrt(n))
        hidden = int(self.embed_dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, kernel_init=dense_init,
                     name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        if self.stabilized:
            y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="dwconv_norm")(y)
        y = DepthwiseConv2d(hidden, 3, stabilized=self.stabilized_dwconv,
                            use_bias=self.dwconv_bias,
                            dtype=self.dtype, name="dwconv")(y, (hw, hw))
        if self.stabilized:
            y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="post_dwconv_norm")(y)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, kernel_init=dense_init,
                     name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        if self.stabilized:
            gamma = self.param("gamma", nn.initializers.constant(0.1), (1,))
            y = y * gamma.astype(y.dtype)
        return y


def resize_pos_embed(pos_embed: jax.Array, new_grid: int) -> jax.Array:
    """Bicubic 2-D interpolation of a [1, N, C] positional embedding to a
    new square grid (reference: HQAViT_Tiny_stl10.py:250-283)."""
    _, n, c = pos_embed.shape
    old_grid = int(math.isqrt(n))
    if old_grid * old_grid != n:
        # non-square grid: repeat/truncate fallback, as in the reference
        new_n = new_grid * new_grid
        if new_n > n:
            reps = new_n // n + 1
            return jnp.tile(pos_embed, (1, reps, 1))[:, :new_n]
        return pos_embed[:, :new_n]
    grid = pos_embed.reshape(old_grid, old_grid, c)
    resized = jax.image.resize(grid, (new_grid, new_grid, c), method="bicubic")
    return resized.reshape(1, new_grid * new_grid, c).astype(pos_embed.dtype)
