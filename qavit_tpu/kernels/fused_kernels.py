"""Pallas TPU kernels for the fused QuadAttentionBlock path.

Being built unit by unit; anything not yet lowered to Pallas runs through
the jnp twins (XLA still fuses those well).  See
:mod:`qavit_tpu.kernels.fused_block` for the orchestration and the
bank-barrier design notes.
"""

from __future__ import annotations


def fused_quad_block_tpu(p, x, state, dpr, bank_params, bank_cfg, geom,
                         dtype, train, rng, pmean_axis):
    from qavit_tpu.kernels.fused_block import fused_quad_block_ref

    return fused_quad_block_ref(p, x, state, dpr, bank_params, bank_cfg,
                                geom, dtype, train, rng, pmean_axis)
