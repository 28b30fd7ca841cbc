"""Attention rollout for the QA-ViT family.

The reference lacks rollout entirely (BASELINE.json names it; SURVEY.md
§7).  Classic rollout multiplies per-layer NxN self-attention maps — but
no branch of QA-ViT ever forms a positional NxN map: every key set is
Linformer-compressed, landmark-pooled or a learned bank, so key indices
are not token positions.  The one positionally-meaningful token-mixing map
in the architecture is the TokenLearner/TokenUpMix pair wrapped around
every block of the hybrid models:

    out[n] = sum_m upmix[m, n] * block(...)[m],   in[m] = sum_n' W[n', m] x[n']

so the effective block mixing matrix is  T = |upmix|^T-normalised  @  W^T,
an NxN positional map.  Rollout composes 0.5*T + 0.5*I across blocks
(Abnar & Zuidema's residual correction) and mean-pools the query side
(the models classify by mean pooling, not CLS).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np


def _normalize_rows(m):
    return m / (m.sum(axis=-1, keepdims=True) + 1e-8)


def attention_rollout(model, variables, image, bank_count=0) -> np.ndarray:
    """Rollout saliency [H, W] in [0, 1] for one image (hybrid models with
    TokenLearner only; raises otherwise)."""
    cfg = model.cfg
    if not (cfg.hybrid and cfg.use_token_learner):
        raise ValueError("attention rollout requires the TokenLearner "
                         "wrapper (hybrid models); use grad_cam instead")
    x = image[None]
    base_vars = {k: v for k, v in variables.items() if k != "perturbations"}
    (_, _), inter = model.apply(
        base_vars, x, train=False, bank_count=bank_count,
        mutable=["intermediates"])

    params = variables["params"]
    n = cfg.num_patches
    rollout = jnp.eye(n)

    for stage_idx, nblocks in enumerate(cfg.stage_blocks, start=1):
        if nblocks == 0:
            continue
        scope = f"stage{stage_idx}_blocks"
        # learner weights: stacked [depth, 1, N, M] under the scan
        w = inter["intermediates"][scope]["token_learner"]["weights"][0]
        w = jnp.asarray(w)          # [nblocks, B, N, M]
        # upmix kernel: Dense over the token axis, stacked [depth, M, N]
        up = params[scope]["token_upmix"]["upsample_attn"]["kernel"]
        for b in range(nblocks):
            learner = w[b, 0]                        # [N, M] softmax over N
            upmix = jnp.abs(up[b])                   # [M, N]
            t = _normalize_rows(upmix.T) @ _normalize_rows(learner.T)
            # t: [N_out, N_in] positional mixing; residual correction
            a = 0.5 * t + 0.5 * jnp.eye(n)
            rollout = a @ rollout

    saliency = rollout.mean(axis=0)                  # mean-pooled queries
    g = int(math.isqrt(n))
    sal = saliency.reshape(g, g)
    sal = sal - sal.min()
    sal = sal / (sal.max() + 1e-8)
    h, w_ = image.shape[:2]
    return np.asarray(jax.image.resize(sal, (h, w_), method="bilinear"))
