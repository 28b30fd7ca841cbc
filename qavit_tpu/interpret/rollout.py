"""Attention rollout for the QA-ViT family.

The reference lacks rollout entirely (BASELINE.json names it; SURVEY.md
§7).  Classic rollout multiplies per-layer NxN self-attention maps — but
no branch of QA-ViT ever forms a positional NxN map directly: every key
set is Linformer-compressed, landmark-pooled or a learned bank, so key
indices are not token positions.  Two positionally-meaningful maps can be
recovered:

* **Hybrid models (TokenLearner wrapper)**: the TokenLearner/TokenUpMix
  pair around every block mixes tokens positionally —

    out[n] = sum_m upmix[m, n] * block(...)[m],  in[m] = sum_n' W[n', m] x[n']

  so the effective block mixing matrix is T = |upmix|^T-norm @ W^T.

* **Pure QAViT (flat trunk)**: the SWA branch attends window queries to
  Linformer-compressed window keys, k_c[m] = sum_j E_k[j, m] k[j] — the
  compressed keys are linear in window positions, so attention mass on
  compressed slot m is redistributed onto positions via
  R[m, j] = |E_k[j, m]| / sum_j |E_k[j, m]|.  Per block this yields a
  window-block-diagonal NxN map  M = A[:, :lin_k] @ R  (bank-key mass is
  dropped and rows renormalised).  The q/k tensors are sown by the SWA
  branch ("attn_q"/"attn_k" intermediates, nn/branches.py).

Rollout composes 0.5*T + 0.5*I across blocks (Abnar & Zuidema's residual
correction) and mean-pools the query side (the models classify by mean
pooling, not CLS).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np


def _normalize_rows(m):
    return m / (m.sum(axis=-1, keepdims=True) + 1e-8)


def _finish(rollout, n, image):
    saliency = rollout.mean(axis=0)                  # mean-pooled queries
    g = int(math.isqrt(n))
    sal = saliency.reshape(g, g)
    sal = sal - sal.min()
    sal = sal / (sal.max() + 1e-8)
    h, w_ = image.shape[:2]
    return np.asarray(jax.image.resize(sal, (h, w_), method="bilinear"))


def _swa_rollout(model, variables, image, bank_count) -> np.ndarray:
    """SWA-branch rollout approximation for pure QAViT (module docstring).

    Only the SWA branch carries a positionally-invertible attention map;
    MSDA/CGA/cross contributions are dropped and rows renormalised, so
    this is a single-branch saliency approximation, not a full rollout
    of the four-branch block."""
    from qavit_tpu.nn import build_model

    cfg = model.cfg
    if cfg.attn_impl == "fused_block":
        # the fused Pallas block never materialises q/k — rebuild on the
        # per-module path (identical numerics, interpretability only)
        model = build_model(cfg.replace(attn_impl="auto"))
    x = image[None]
    base_vars = {k: v for k, v in variables.items() if k != "perturbations"}
    (_, _), inter = model.apply(
        base_vars, x, train=False, bank_count=bank_count,
        mutable=["intermediates"])

    swa_inter = inter["intermediates"]["blocks"]["swa"]
    q_all = jnp.asarray(swa_inter["attn_q"][0])      # [depth, nW, ws2, H, D]
    k_all = jnp.asarray(swa_inter["attn_k"][0])      # [depth, nW, K, H, D]
    e_k = jnp.asarray(
        variables["params"]["blocks"]["swa"]["linformer"]["E_k"]
    ).astype(jnp.float32)                            # [depth, ws2, lin_k]

    n = cfg.num_patches
    grid = int(math.isqrt(n))
    ws = cfg.window_size
    pad_grid = grid + (ws - grid % ws) % ws
    nw_side = pad_grid // ws
    lin_k = cfg.linformer_k

    # Window partition layout (nn/branches.py:79-84) as one precomputed
    # permutation: padded-grid position of every (window, local) pair,
    # plus the padded position holding each real flat token.  Replaces
    # the former per-window Python scatter (VERDICT r4 weak #6) so 224
    # geometry (n=196, nW=16, depth 8) composes in a handful of numpy ops.
    wr, wc = np.divmod(np.arange(nw_side * nw_side), nw_side)
    lr, lc = np.divmod(np.arange(ws * ws), ws)
    row = wr[:, None] * ws + lr[None, :]             # [nW, ws2] padded row
    col = wc[:, None] * ws + lc[None, :]             # [nW, ws2] padded col
    pad_pos = row * pad_grid + col                   # bijection onto P
    valid = (row < grid) & (col < grid)
    pad_of_tok = np.empty(n, np.int64)
    pad_of_tok[(row * grid + col)[valid]] = pad_pos[valid]

    depth = q_all.shape[0]
    # all blocks at once: [depth, nW, ws2, K] head-mean attention
    d = q_all.shape[-1]
    logits = jnp.einsum("bwnhd,bwmhd->bwhnm",
                        q_all.astype(jnp.float32),
                        k_all.astype(jnp.float32)) / math.sqrt(d)
    attn = jax.nn.softmax(logits, axis=-1).mean(2)
    # redistribute compressed-key mass back onto window positions
    r_map = jnp.abs(e_k)                             # [depth, ws2, lin_k]
    r_map = r_map / (r_map.sum(1, keepdims=True) + 1e-8)
    m_win = jnp.einsum("bwnk,bjk->bwnj", attn[..., :lin_k], r_map)
    m_win = np.asarray(_normalize_rows(m_win))       # [depth, nW, ws2, ws2]

    # one batched scatter into padded block-diagonal maps, then select
    # the real-token rows/cols and renormalise over surviving columns
    p_tot = pad_grid * pad_grid
    t_pad = np.zeros((depth, p_tot, p_tot), np.float32)
    t_pad[:, pad_pos[:, :, None], pad_pos[:, None, :]] = m_win
    t = t_pad[:, pad_of_tok[:, None], pad_of_tok[None, :]]
    t = t / (t.sum(-1, keepdims=True) + 1e-8)        # [depth, n, n]

    rollout = np.eye(n, dtype=np.float32)
    eye = np.eye(n, dtype=np.float32)
    for b in range(depth):
        rollout = (0.5 * t[b] + 0.5 * eye) @ rollout

    return _finish(jnp.asarray(rollout), n, image)


def attention_rollout(model, variables, image, bank_count=0) -> np.ndarray:
    """Rollout saliency [H, W] in [0, 1] for one image.

    Hybrid models with TokenLearner use the learner/upmix positional map;
    pure QAViT uses the SWA Linformer back-mapped attention.  Hybrid
    models WITHOUT a TokenLearner have no positional mixing map — raises
    (use grad_cam there)."""
    cfg = model.cfg
    if not cfg.hybrid:
        return _swa_rollout(model, variables, image, bank_count)
    if not cfg.use_token_learner:
        raise ValueError("attention rollout on hybrid models requires the "
                         "TokenLearner wrapper; use grad_cam instead")
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

    return _finish(rollout, n, image)
