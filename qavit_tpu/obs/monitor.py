"""Gradient monitoring — per-pytree-path norms, NaN/Inf detection and
explosion alerting (GradientMonitor, QAViT.py:100-155 /
HQAViT_CIFAR100.py:190-250).

The heavy per-parameter statistics run *in-graph* (one jitted reduction
per leaf, fused by XLA) and only scalars cross to the host.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def grad_stats(grads) -> Dict[str, jax.Array]:
    """Per-leaf gradient norms + global norm + NaN/Inf flags.  jit-safe."""
    leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    per_leaf = {}
    total_sq = jnp.zeros((), jnp.float32)
    any_nan = jnp.zeros((), jnp.bool_)
    any_inf = jnp.zeros((), jnp.bool_)
    for path, g in leaves:
        g32 = g.astype(jnp.float32)
        sq = jnp.sum(g32 * g32)
        per_leaf[_path_str(path)] = jnp.sqrt(sq)
        total_sq = total_sq + sq
        any_nan = any_nan | jnp.isnan(g32).any()
        any_inf = any_inf | jnp.isinf(g32).any()
    return {"per_leaf": per_leaf, "global_norm": jnp.sqrt(total_sq),
            "has_nan": any_nan, "has_inf": any_inf}


class GradientMonitor:
    """Host-side tracker mirroring the reference's API: log norms, count
    explosions (threshold 50, HQAViT_CIFAR100.py:244-250), report the
    worst layers."""

    def __init__(self, explosion_threshold: float = 50.0):
        self.grad_norms: List[float] = []
        self.param_norms: List[float] = []
        self.explosion_count = 0
        self.threshold = explosion_threshold
        self.layer_grad_history: Dict[str, List[float]] = {}

    def log(self, grad_norm: float, param_norm: float,
            per_leaf: Dict[str, float] = None) -> bool:
        self.grad_norms.append(float(grad_norm))
        self.param_norms.append(float(param_norm))
        if per_leaf:
            for name, norm in per_leaf.items():
                layer = "/".join(name.split("/")[:2])
                self.layer_grad_history.setdefault(layer, []).append(
                    float(norm))
        exploding = self.grad_norms[-1] > self.threshold
        if exploding:
            self.explosion_count += 1
        return exploding

    def top_layers(self, k: int = 10) -> List[Tuple[str, float]]:
        latest = {name: hist[-1]
                  for name, hist in self.layer_grad_history.items() if hist}
        return sorted(latest.items(), key=lambda kv: -kv[1])[:k]

    def print_stats(self, epoch: int, step: int) -> None:
        if not self.grad_norms:
            return
        g, p = self.grad_norms[-1], self.param_norms[-1]
        print(f"[Epoch {epoch}, Step {step}] Gradient Stats:")
        print(f"  Grad Norm: {g:.4f}")
        print(f"  Param Norm: {p:.4f}")
        print(f"  Grad/Param Ratio: {g / max(p, 1e-8):.4f}")


def check_for_nan(loss: float) -> bool:
    """Hard NaN abort check (HQAViT_Tiny_stl10.py:285-292)."""
    import math

    return math.isnan(loss) or math.isinf(loss)
