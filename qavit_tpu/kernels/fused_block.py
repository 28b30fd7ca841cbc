"""Fused QuadAttentionBlock execution over an explicit parameter pytree.

``attn_impl="fused_block"`` routes the whole block (norm1 -> 4 branches
with sequential bank carry -> fusion tail) through this module instead of
the flax submodule graph.  Units dispatch to Pallas TPU kernels
(:mod:`qavit_tpu.kernels.fused_kernels`) on TPU and to the pure-jnp twins
(:mod:`qavit_tpu.kernels.fused_ref`) elsewhere.

The bank's write update is a GLOBAL batch mean read by the *next* branch
(torch semantics: in-place mutation during the forward, QAViT.py:183-224),
which forces a device-wide barrier between branches — hence one fused unit
per branch plus tiny XLA glue to finish each bank update, rather than one
monolithic kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qavit_tpu.configs.model import BankConfig
from qavit_tpu.kernels import fused_ref as R
from qavit_tpu.nn.bank import BankState


def finish_bank_update(bank_cfg: BankConfig, state: BankState,
                       part_k: jax.Array, part_v: jax.Array, batch: int,
                       pmean_axis: Optional[str]) -> BankState:
    """Turn per-batch partial SUMS into the clamped, warmup-scheduled bank
    update (tail of qavit_tpu/nn/bank.py:bank_write — tested equal)."""
    upd_k = (part_k / batch)[None]
    upd_v = (part_v / batch)[None]
    if pmean_axis is not None:
        upd_k = jax.lax.pmean(upd_k, pmean_axis)
        upd_v = jax.lax.pmean(upd_v, pmean_axis)
    upd_k = jnp.clip(upd_k, -bank_cfg.update_clamp, bank_cfg.update_clamp)
    upd_v = jnp.clip(upd_v, -bank_cfg.update_clamp, bank_cfg.update_clamp)
    rate = jnp.where(state.count < bank_cfg.warmup_writes,
                     bank_cfg.update_rate_warm, bank_cfg.update_rate)
    new_k_val = jnp.clip(state.k + rate * upd_k,
                         -bank_cfg.value_clamp, bank_cfg.value_clamp)
    new_v_val = jnp.clip(state.v + rate * upd_v,
                         -bank_cfg.value_clamp, bank_cfg.value_clamp)
    new_k = state.k + jax.lax.stop_gradient(new_k_val - state.k)
    new_v = state.v + jax.lax.stop_gradient(new_v_val - state.v)
    return BankState(new_k, new_v, state.count + 1)


# Tests flip this to exercise the Pallas kernels in interpreter mode on
# CPU (the standard JAX substitute for kernel CI without a chip).
FORCE_PALLAS_INTERPRET = False


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu" or FORCE_PALLAS_INTERPRET


def fused_quad_block(p: Dict[str, Any], x: jax.Array, state: BankState,
                     dpr, bank_params: Dict[str, Any],
                     bank_cfg: BankConfig, geom: R.FusedGeom, dtype,
                     train: bool, rng: Optional[jax.Array],
                     pmean_axis: Optional[str]
                     ) -> Tuple[jax.Array, BankState]:
    """One QuadAttentionBlock forward on tokens ``x`` [B, n, C]."""
    if _use_pallas():
        from qavit_tpu.kernels import fused_kernels as K
        return K.fused_quad_block_tpu(
            p, x, state, dpr, bank_params, bank_cfg, geom, dtype, train,
            rng, pmean_axis,
            interpret=jax.default_backend() != "tpu")
    return fused_quad_block_ref(p, x, state, dpr, bank_params, bank_cfg,
                                geom, dtype, train, rng, pmean_axis)


def fused_quad_block_ref(p, x, state, dpr, bank_params, bank_cfg, geom,
                         dtype, train, rng, pmean_axis):
    """jnp-twin execution (CPU fallback + numerics reference)."""
    b = x.shape[0]
    m = R.make_block_masks(rng, b, geom, dpr, train)

    xn = R.layer_norm(x, p["norm1"], dtype)

    def write(state, normed):
        if not train:
            return state
        pk, pv = R.bank_write_partial(bank_params, normed)
        return finish_bank_update(bank_cfg, state, pk, pv, b, pmean_axis)

    out_swa, normed = R.swa_ref(p["swa"], xn, state.k, state.v, geom,
                                dtype, masks=(m["swa_attn"],
                                              m["swa_proj"]))
    state = write(state, normed)
    out_msda, normed = R.msda_ref(p["msda"], xn, state.k, state.v, geom,
                                  dtype, masks=(m["msda_attn"],
                                                m["msda_proj"]))
    state = write(state, normed)
    out_cga, normed = R.cga_ref(p["cga"], xn, state.k, state.v, geom,
                                dtype, masks=(m["cga_attn"],
                                              m["cga_proj"]))
    state = write(state, normed)
    out_cross = R.cross_ref(p["cross_attn"], xn, state.k, state.v, geom,
                            dtype, masks=(m["cross_attn"],
                                          m["cross_proj"]))

    y = R.tail_ref(p, x, (out_swa, out_msda, out_cga, out_cross),
                   geom, dtype, masks=(m["bn1"], m["bn2"], m["dp1"],
                                       m["ffn"], m["dp2"]))
    return y, state
