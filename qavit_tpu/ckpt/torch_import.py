"""Torch state_dict importer.

Converts a reference checkpoint's ``state_dict`` (HQAViT_CIFAR100.py /
QAViT.py module layouts, incl. ``module.`` / ``_orig_mod.`` prefixes,
test_hqa.py:94-104) into this framework's flax param tree — including the
nn.scan-stacked block parameters (leading depth axis).

Weight-layout transforms:
* Linear ``[out, in]``            -> Dense kernel ``[in, out]`` (transpose)
* Conv2d ``[out, in, kh, kw]``    -> flax kernel ``[kh, kw, in, out]``
* depthwise Conv2d ``[C,1,k,k]``  -> ``[k, k, 1, C]`` (same transpose)
* patch-embed conv                -> Dense kernel ``[(p*p*cin), C]`` in
  (ph, pw, cin) patch-vector order (matches nn/layers.py PatchEmbed)
* LayerNorm/BatchNorm weight/bias -> scale/bias; running stats ->
  batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

# flax scope/leaf name -> torch module name fragments
_SEG_MAP = {
    "attn_norm": "attention.0",
    "attn_fc": "attention.1",
    "cat_fc": "cat_mlp.0",
    "cat_norm": "cat_mlp.1",
    "stem_conv": "stem.0",
    "stem_bn": "stem.1",
    "stage1_conv": "stage1.0",
    "stage1_bn": "stage1.1",
    "stage1_block": "stage1.3",
    "stage2_conv": "stage2.0",
    "stage2_bn": "stage2.1",
    "stage2_block": "stage2.2",
    "stage3_conv": "stage3.0",
    "stage3_bn": "stage3.1",
    "stage3_block": "stage3.2",
    "block0": "blocks.0",
    "block1": "blocks.1",
    "block2": "blocks.2",
    # v2 ConvNeXt patchify stem (HQAViTv2_CIFAR100.py:753-832)
    "stem_norm": "stem.1",
    "stage2_block0": "stage2.0",
    "stage2_block1": "stage2.1",
    "stage3_block0": "stage3.0",
    "stage3_block1": "stage3.1",
    "stage3_block2": "stage3.2",
    "stage4_block0": "stage4.0",
    "stage4_block1": "stage4.1",
    "down2_norm": "downsample2.0",
    "down2_conv": "downsample2.1",
    "down3_norm": "downsample3.0",
    "down3_conv": "downsample3.1",
}

# Linear weights are ALWAYS [out,in] in torch and must always be
# transposed — shape-based detection breaks for square weights (the
# v1 bank's write_compression is [192,192] and imported untransposed
# until round 4; bank K was off by ~0.02 while V matched at 5e-7).
_BANK_MAP = {
    "write_norm_scale": ("write_norm.weight", "as_is"),
    "write_norm_bias": ("write_norm.bias", "as_is"),
    "write_compression_kernel": ("write_compression.weight", "dense_t"),
    "write_compression_bias": ("write_compression.bias", "as_is"),
    "write_gate_kernel": ("write_gate.weight", "dense_t"),
    "write_gate_bias": ("write_gate.bias", "as_is"),
}


def strip_prefixes(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Strip ``module.`` / ``_orig_mod.`` prefixes (test_hqa.py:94-104)."""
    out = {}
    for k, v in state_dict.items():
        for pre in ("module.", "_orig_mod."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = np.asarray(v)
    return out


def _leaf_to_torch(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Map a flax param path (scope..., leaf) to (torch key, kind)."""
    *scopes, leaf = path
    if scopes and scopes[0] == "global_bank" and leaf in _BANK_MAP:
        tkey, kind = _BANK_MAP[leaf]
        return "global_bank." + tkey, kind
    segs = [_SEG_MAP.get(s, s) for s in scopes]
    if leaf == "kernel":
        return ".".join(segs + ["weight"]), "kernel"
    if leaf == "scale" and segs and segs[-1] == "dwconv":
        # stabilised DepthwiseConv2d's learnable scale [1,C,1,1] -> [C]
        return ".".join(segs + ["scale"]), "reshape"
    if leaf == "scale":
        return ".".join(segs + ["weight"]), "as_is"
    if leaf == "bias":
        return ".".join(segs + ["bias"]), "as_is"
    if leaf in ("mean", "var"):
        return ".".join(segs + [f"running_{leaf}"]), "as_is"
    if leaf == "qkv_kernel":
        return ".".join(segs + ["qkv", "weight"]), "dense_t"
    if leaf == "qkv_bias":
        return ".".join(segs + ["qkv", "bias"]), "as_is"
    if leaf == "gamma" and segs and segs[-1] == "ccf_ffn":
        return ".".join(segs + ["gamma"]), "as_is"
    # plain parameter leaves (pos_embed, global_k, fusion_weights, beta,
    # E_k, E_v, gamma, scale ...)
    return ".".join(segs + [leaf]), "reshape"


def _transform(tv: np.ndarray, target_shape, kind: str) -> np.ndarray:
    if kind == "kernel":
        if tv.ndim == 4:
            tv = tv.transpose(2, 3, 1, 0)          # conv OIHW -> HWIO
            if len(target_shape) == 2:             # patch-embed as Dense
                tv = tv.reshape(-1, tv.shape[-1])
        elif tv.ndim == 2:
            tv = tv.T                              # Linear [out,in]->[in,out]
    elif kind == "dense_t":
        tv = tv.T
    if (kind == "as_is" and tv.ndim == 3 and len(target_shape) == 3
            and tuple(tv.shape) != tuple(target_shape)):
        # spatial LayerNorm affine: torch [C, H, W] -> NHWC [H, W, C]
        tv = tv.transpose(1, 2, 0)
    if tuple(tv.shape) != tuple(target_shape):
        tv = tv.reshape(target_shape)
    return tv


def import_torch_state_dict(state_dict: Dict[str, Any], template_params,
                            template_batch_stats: Optional[dict] = None):
    """Convert a torch state_dict into (params, batch_stats) matching the
    given templates.  Raises KeyError with the missing torch key."""
    import jax

    tdict = strip_prefixes(state_dict)

    def convert_tree(tree, collection: str):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        leaves, treedef = flat[0], flat[1]
        new_leaves = []
        for path, leaf in leaves:
            keys = tuple(getattr(p, "key", str(p)) for p in path)
            target_shape = leaf.shape
            # scan-stacked block scope: leading axis = depth
            stacked = keys and ("blocks" in keys[0])
            if stacked:
                depth = target_shape[0]
                per = []
                for j in range(depth):
                    tpath = (f"{keys[0]}.{j}",) + keys[1:]
                    tkey, kind = _leaf_to_torch(tpath)
                    if tkey not in tdict:
                        raise KeyError(f"missing torch key {tkey!r} "
                                       f"for {'/'.join(keys)}")
                    per.append(_transform(tdict[tkey], target_shape[1:],
                                          kind))
                arr = np.stack(per)
            else:
                tkey, kind = _leaf_to_torch(keys)
                if tkey not in tdict:
                    raise KeyError(f"missing torch key {tkey!r} "
                                   f"for {'/'.join(keys)}")
                arr = _transform(tdict[tkey], target_shape, kind)
            new_leaves.append(arr.astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    params = convert_tree(template_params, "params")
    batch_stats = None
    if template_batch_stats:
        batch_stats = convert_tree(template_batch_stats, "batch_stats")
    return params, batch_stats
