"""Parameter holders for the fused block path.

``attn_impl="fused_block"`` computes the block with fused kernels over an
explicit parameter pytree instead of flax submodule calls.  These holder
modules declare parameters at EXACTLY the paths / shapes / initializers the
reference flax modules (nn/branches.py, nn/block.py, nn/layers.py) create —
flax derives each parameter's init RNG from its path, so the two paths
initialise bit-identically and share checkpoints (tested in
tests/test_fused_block.py).
"""

from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.kernels.fused_ref import FusedGeom
from qavit_tpu.nn.layers import conv_init, dense_init


class DenseP(nn.Module):
    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> Dict[str, Any]:
        return {
            "kernel": self.param("kernel", dense_init,
                                 (self.in_features, self.features)),
            "bias": self.param("bias", nn.initializers.zeros,
                               (self.features,)),
        }


class LNP(nn.Module):
    features: int

    @nn.compact
    def __call__(self) -> Dict[str, Any]:
        return {
            "scale": self.param("scale", nn.initializers.ones,
                                (self.features,)),
            "bias": self.param("bias", nn.initializers.zeros,
                               (self.features,)),
        }


class LinformerP(nn.Module):
    seq_len: int
    compressed_len: int

    @nn.compact
    def __call__(self) -> Dict[str, Any]:
        init = nn.initializers.normal(0.02)
        return {
            "E_k": self.param("E_k", init,
                              (self.seq_len, self.compressed_len)),
            "E_v": self.param("E_v", init,
                              (self.seq_len, self.compressed_len)),
        }


class SWAP(nn.Module):
    cfg: ModelConfig
    geom: FusedGeom

    @nn.compact
    def __call__(self):
        c, g = self.cfg.embed_dim, self.geom
        return {
            "qkv": DenseP(c, 3 * c, name="qkv")(),
            "linformer": LinformerP(g.ws2, g.lin_k, name="linformer")(),
            "proj": DenseP(c, c, name="proj")(),
            "norm": LNP(c, name="norm")(),
        }


class MSDAP(nn.Module):
    cfg: ModelConfig
    geom: FusedGeom

    @nn.compact
    def __call__(self):
        c, g = self.cfg.embed_dim, self.geom
        return {
            "qkv_kernel": self.param("qkv_kernel", dense_init, (c, 3 * c)),
            "qkv_bias": self.param("qkv_bias", nn.initializers.zeros,
                                   (3 * c,)),
            "linformer": LinformerP(self.cfg.msda_pad_len, g.lin_k,
                                    name="linformer")(),
            "proj": DenseP(c, c, name="proj")(),
            "norm": LNP(c, name="norm")(),
        }


class CGAP(nn.Module):
    cfg: ModelConfig
    geom: FusedGeom

    @nn.compact
    def __call__(self):
        c, g = self.cfg.embed_dim, self.geom
        cpg = c // g.groups
        comp_c = c // 2
        return {
            "q_proj": DenseP(cpg, g.cperg, name="q_proj")(),
            "k_proj": DenseP(cpg, g.cperg, name="k_proj")(),
            "v_proj": DenseP(cpg, g.cperg, name="v_proj")(),
            "bank_k_proj": DenseP(c, g.cperg, name="bank_k_proj")(),
            "bank_v_proj": DenseP(c, g.cperg, name="bank_v_proj")(),
            "proj": DenseP(comp_c, c, name="proj")(),
            "norm": LNP(c, name="norm")(),
        }


class CrossP(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self):
        c = self.cfg.embed_dim
        return {
            "q_proj": DenseP(c, c, name="q_proj")(),
            "k_proj": DenseP(c, c, name="k_proj")(),
            "v_proj": DenseP(c, c, name="v_proj")(),
            "proj": DenseP(c, c, name="proj")(),
        }


class ConvP(nn.Module):
    """The nn.Conv leaf inside DepthwiseConv2d (kernel [3,3,1,C])."""

    dim: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        out = {"kernel": self.param("kernel", conv_init,
                                    (3, 3, 1, self.dim))}
        if self.use_bias:
            out["bias"] = self.param("bias", nn.initializers.zeros,
                                     (self.dim,))
        return out


class DWConvP(nn.Module):
    """DepthwiseConv2d tree: nested nn.Conv 'dwconv' (+ optional scale)."""

    dim: int
    stabilized: bool
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        out = {"dwconv": ConvP(self.dim,
                               self.use_bias or not self.stabilized,
                               name="dwconv")()}
        if self.stabilized:
            out["scale"] = self.param("scale",
                                      nn.initializers.constant(0.1),
                                      (self.dim,))
        return out


class CCFFFNP(nn.Module):
    cfg: ModelConfig
    geom: FusedGeom

    @nn.compact
    def __call__(self):
        c, g = self.cfg.embed_dim, self.geom
        hidden = g.ccf_hidden
        out = {"fc1": DenseP(c, hidden, name="fc1")()}
        if g.stabilized_ccfffn:
            out["dwconv_norm"] = LNP(hidden, name="dwconv_norm")()
        out["dwconv"] = DWConvP(hidden, g.stabilized_dwconv,
                                use_bias=g.dwconv_bias, name="dwconv")()
        if g.stabilized_ccfffn:
            out["post_dwconv_norm"] = LNP(hidden,
                                          name="post_dwconv_norm")()
        out["fc2"] = DenseP(hidden, c, name="fc2")()
        if g.stabilized_ccfffn:
            out["gamma"] = self.param("gamma",
                                      nn.initializers.constant(0.1), (1,))
        return out


class FusionP(nn.Module):
    num_branches: int = 4

    @nn.compact
    def __call__(self):
        return {"fusion_weights": self.param("fusion_weights",
                                             nn.initializers.ones,
                                             (self.num_branches,))}


class BottleneckP(nn.Module):
    in_features: int
    hidden: int

    @nn.compact
    def __call__(self):
        return {
            "fc1": DenseP(self.in_features, self.hidden, name="fc1")(),
            "fc2": DenseP(self.hidden, self.in_features, name="fc2")(),
        }


def declare_block_params(cfg: ModelConfig, geom: FusedGeom
                         ) -> Dict[str, Any]:
    """Declare the full QuadAttentionBlock parameter tree.

    Must be called from inside the block's compact ``__call__`` so the
    holders auto-register under the block's scope with the reference
    module names.
    """
    c = cfg.embed_dim
    p = {
        "norm1": LNP(c, name="norm1")(),
        "swa": SWAP(cfg, geom, name="swa")(),
        "msda": MSDAP(cfg, geom, name="msda")(),
        "cga": CGAP(cfg, geom, name="cga")(),
        "cross_attn": CrossP(cfg, name="cross_attn")(),
        "fusion": FusionP(4, name="fusion")(),
        "bottleneck_mlp": BottleneckP(c, geom.bottleneck_hidden,
                                      name="bottleneck_mlp")(),
        "norm2": LNP(c, name="norm2")(),
        "ccf_ffn": CCFFFNP(cfg, geom, name="ccf_ffn")(),
    }
    for name in ("swa", "msda", "cga", "cross"):
        p[f"norm_{name}"] = LNP(c, name=f"norm_{name}")()
        p[f"compress_{name}"] = DenseP(c, geom.d_c,
                                       name=f"compress_{name}")()
    return p
