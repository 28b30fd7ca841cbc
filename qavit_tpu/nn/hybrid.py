"""HQA-ViT hybrid CNN-aggregation components (SURVEY.md §2.4).

Rebuilds ConvNeXtBlock (HQAViT_CIFAR100.py:718-739; LayerScale variant
HQAViTv2_CIFAR100.py:719-751), CNNStemModel (v1 HQAViT_CIFAR100.py:742-793;
ConvNeXt-patchify v2 HQAViTv2_CIFAR100.py:753-832), LMFAdapter (:799-849),
RRCV (:855-907) and SplitFusion (:913-965) in NHWC for TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qavit_tpu.nn.dwconv import MatmulDWConv
from qavit_tpu.nn.layers import LN_EPS, DropPath, conv_init, dense_init


class ConvNeXtBlock(nn.Module):
    """dw7x7 -> LN -> pw 4x expand -> GELU -> pw project [-> LayerScale]
    -> residual (HQAViT_CIFAR100.py:718-739)."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init: Optional[float] = None   # 1e-6 in the v2 stem
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, H, W, C]
        y = MatmulDWConv(self.dim, (7, 7), dtype=self.dtype,
                         name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, kernel_init=dense_init,
                     name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, kernel_init=dense_init,
                     name="pwconv2")(y)
        if self.layer_scale_init is not None:
            gamma = self.param("gamma",
                               nn.initializers.constant(self.layer_scale_init),
                               (self.dim,))
            y = y * gamma.astype(y.dtype)
        return x + DropPath(name="drop_path")(y, self.drop_path, train)


class CNNStemV1(nn.Module):
    """v1 lateral CNN backbone: conv/BN stem + 1x1-projected stages, all
    lateral features at token resolution (HQAViT_CIFAR100.py:742-793).

    32x32 -> 16x16 -> 8x8; returns F2/F3/F4 at [B, 8, 8, c*].
    """

    c2: int = 64
    c3: int = 128
    c4: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        # explicit symmetric padding: torch Conv2d(k=3, s=2, p=1); flax
        # "SAME" would pad asymmetrically for stride 2 and shift the grid
        y = nn.Conv(32, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    kernel_init=conv_init, name="stem_conv")(x)
        y = nn.gelu(bn("stem_bn")(y), approximate=False)

        y = nn.Conv(self.c2, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=conv_init,
                    name="stage1_conv")(y)
        y = nn.gelu(bn("stage1_bn")(y), approximate=False)
        f2 = ConvNeXtBlock(self.c2, dtype=self.dtype, name="stage1_block")(
            y, train)

        y = nn.Conv(self.c3, (1, 1), dtype=self.dtype, kernel_init=conv_init,
                    name="stage2_conv")(f2)
        y = bn("stage2_bn")(y)
        f3 = ConvNeXtBlock(self.c3, dtype=self.dtype, name="stage2_block")(
            y, train)

        y = nn.Conv(self.c4, (1, 1), dtype=self.dtype, kernel_init=conv_init,
                    name="stage3_conv")(f3)
        y = bn("stage3_bn")(y)
        f4 = ConvNeXtBlock(self.c4, dtype=self.dtype, name="stage3_block")(
            y, train)
        return f2, f3, f4


class SpatialLayerNorm(nn.Module):
    """torch ``nn.LayerNorm([C, H, W])`` equivalent: normalise each sample
    over all of (H, W, C) with a per-position affine
    (HQAViTv2_CIFAR100.py:766)."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        shape = x.shape[1:]
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(1, 2, 3), keepdims=True)
        var = x32.var(axis=(1, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        return (y * scale + bias).astype(self.dtype)


class CNNStemConvNeXt(nn.Module):
    """v2 ConvNeXt-Tiny-style backbone: 4x4 patchify stem + spatial LN,
    stages of LayerScale ConvNeXt blocks with LN+1x1 downsample layers
    (HQAViTv2_CIFAR100.py:753-832)."""

    c2: int = 64
    c3: int = 128
    c4: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls = 1e-6
        y = nn.Conv(self.c2, (4, 4), strides=4, padding="VALID",
                    dtype=self.dtype,
                    kernel_init=conv_init, name="stem_conv")(x)
        y = SpatialLayerNorm(dtype=self.dtype, name="stem_norm")(y)

        for i in range(2):
            y = ConvNeXtBlock(self.c2, 0.0, ls, dtype=self.dtype,
                              name=f"stage2_block{i}")(y, train)
        f2 = y

        y = SpatialLayerNorm(dtype=self.dtype, name="down2_norm")(f2)
        y = nn.Conv(self.c3, (1, 1), dtype=self.dtype, kernel_init=conv_init,
                    name="down2_conv")(y)
        for i, dp in enumerate((0.0, 0.1, 0.1)):
            y = ConvNeXtBlock(self.c3, dp, ls, dtype=self.dtype,
                              name=f"stage3_block{i}")(y, train)
        f3 = y

        y = SpatialLayerNorm(dtype=self.dtype, name="down3_norm")(f3)
        y = nn.Conv(self.c4, (1, 1), dtype=self.dtype, kernel_init=conv_init,
                    name="down3_conv")(y)
        for i, dp in enumerate((0.1, 0.1)):
            y = ConvNeXtBlock(self.c4, dp, ls, dtype=self.dtype,
                              name=f"stage4_block{i}")(y, train)
        f4 = y
        return f2, f3, f4


class LMFAdapter(nn.Module):
    """CNN feature map -> tokens: {dw3x3, dw5x5, identity} concat -> 1x1
    projection -> bilinear resize to the token grid -> LN -> GELU
    (HQAViT_CIFAR100.py:799-849)."""

    embed_dim: int
    target_hw: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat):
        b, h, w, c = feat.shape
        f1 = MatmulDWConv(c, (3, 3), dtype=self.dtype,
                          name="dwconv_3x3")(feat)
        f2 = MatmulDWConv(c, (5, 5), dtype=self.dtype,
                          name="dwconv_5x5")(feat)
        f_cat = jnp.concatenate([f1, f2, feat], axis=-1)
        f_proj = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                         kernel_init=conv_init, name="proj")(f_cat)
        if h != self.target_hw or w != self.target_hw:
            f_proj = jax.image.resize(
                f_proj, (b, self.target_hw, self.target_hw, self.embed_dim),
                method="bilinear").astype(f_proj.dtype)
        tokens = f_proj.reshape(b, self.target_hw * self.target_hw,
                                self.embed_dim)
        tokens = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="norm")(tokens)
        return nn.gelu(tokens, approximate=False)


class RRCV(nn.Module):
    """Reverse Reconstruction CNN-Variants: tokens -> feature map -> 1x1 to
    rec_channels -> ConvNeXt block(s) -> 1x1 back -> LN -> A + beta*R
    (HQAViT_CIFAR100.py:855-907)."""

    embed_dim: int
    rec_channels: int = 64
    num_blocks: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, hw: Tuple[int, int], train: bool = False):
        b, n, c = tokens.shape
        h, w = hw
        x = tokens.reshape(b, h, w, c)
        r = nn.Conv(self.rec_channels, (1, 1), dtype=self.dtype,
                    kernel_init=conv_init, name="reverse_proj")(x)
        for i in range(self.num_blocks):
            r = ConvNeXtBlock(self.rec_channels, dtype=self.dtype,
                              name=f"block{i}")(r, train)
        r = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    kernel_init=conv_init, name="reembed_proj")(r)
        r = r.reshape(b, n, self.embed_dim)
        r = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(r)
        beta = self.param("beta", nn.initializers.constant(0.1), ())
        return tokens + beta.astype(r.dtype) * r


class SplitFusion(nn.Module):
    """75/25 additive/concatenative fusion of ViT tokens and CNN tokens
    with a sigmoid gate, a concat MLP and learnable softmax weights
    (HQAViT_CIFAR100.py:913-965)."""

    embed_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t_in, r, train: bool = False):
        t_add = t_in + r
        gate = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="gate_norm")(t_add)
        gate = nn.Dense(self.embed_dim, dtype=self.dtype,
                        kernel_init=dense_init, name="gate_fc")(gate)
        gate = jax.nn.sigmoid(gate)
        t_add_out = t_in + gate * r

        t_cat = jnp.concatenate([t_in, r], axis=-1)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, kernel_init=dense_init,
                     name="cat_fc")(t_cat)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                         name="cat_norm")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        t_cat_out = t_in + y

        w = self.param("fusion_weights",
                       lambda key, shape: jnp.array([0.75, 0.25]), (2,))
        w = jax.nn.softmax(w.astype(jnp.float32)).astype(t_in.dtype)
        fused = w[0] * t_add_out + w[1] * t_cat_out
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="final_norm")(fused)
