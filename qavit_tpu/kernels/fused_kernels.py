"""Pallas TPU execution of the fused QuadAttentionBlock path.

The block is four Pallas kernels with tiny XLA glue between them — the
bank's global-batch-mean write (torch in-place mutation, QAViT.py:183-224)
is a device-wide barrier between branches, so one kernel per bank epoch:

    K1  norm1 + SWA branch      -> out_swa, xn, bank partials
    K2  MSDA branch (new bank)  -> out_msda, bank partials
    K3  CGA branch  (new bank)  -> out_cga,  bank partials
    K4  cross branch + tail     -> block output

Each kernel runs via :func:`qavit_tpu.kernels.fused_pallas.run_unit`:
grid over batch tiles, weights resident in VMEM, custom_vjp backward that
recomputes the unit inside the kernel (``jax.vjp`` at trace time).  All
weight preparation (per-head slicing, kron token-mix matrices, CGA group
routing) happens HERE in XLA via :func:`fused_cores.prep_block` — the
kernels only see lane-dim-pure tensors (fused_cores design rules).
Dropout masks are drawn in-kernel from the TPU PRNG, seeded per
(branch, tile) from the step rng — fwd and recompute-bwd reseed
identically, so gradients see the same masks.  This replaces the
reference's out-of-core FlashAttention usage (QAViT.py:26-30,
QAViTV2_EXTREME.py:570-620) with a whole-block-in-VMEM design.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from qavit_tpu.kernels import fused_cores as C
from qavit_tpu.kernels import fused_ref as R
from qavit_tpu.kernels.fused_pallas import run_unit
from qavit_tpu.nn.bank import BankState

_TAIL_KEYS = ("norm_swa", "norm_msda", "norm_cga", "norm_cross",
              "compress_swa", "compress_msda", "compress_cga",
              "compress_cross", "fusion", "bottleneck_mlp", "norm2",
              "ccf_ffn")


@functools.lru_cache(maxsize=None)
def make_cores(geom: R.FusedGeom, G: int, dtype_name: str, train: bool):
    """Unit cores (diff, batch, aux, const, smem, tile_idx) ->
    (batch_outs, accum_outs) wrapping the fused_cores branch cores."""
    dtype = jnp.dtype(dtype_name)
    need_rng = train

    def make_rng(smem, tile_idx, branch_id):
        if not need_rng or smem is None:
            return C.NullRng()
        return C.PallasRng(geom.dropout, smem["dpr"][0],
                           (smem["seeds"][2 * branch_id],
                            smem["seeds"][2 * branch_id + 1]), tile_idx)

    # The bank k/v ride in the *diff* group: attention READS must
    # differentiate into global_k/global_v exactly like the torch
    # parameters (QAViT.py:183-224; nn/bank.py contract, test_bank.py).
    # The d_bank broadcast-reduction chain lowers because the broadcast
    # is the custom-vjp `fused_cores.bcast_rows` (laundered batch-sum
    # backward).  Only the WRITE-path params stay in the non-diff
    # ``const`` group — their outputs feed stop-gradient carries, so
    # they are frozen at init in torch too.

    def partials(const, normed):
        if not train:
            return {}
        pk, pv = R.bank_write_partial(const["bankp"], normed)
        return {"pk": pk, "pv": pv}

    def core_swa(diff, batch, aux, const, smem, tile_idx):
        rng = make_rng(smem, tile_idx, 0)
        xn = R.layer_norm(batch["x"], diff["norm1"], dtype)
        out, normed = C.swa_bd(diff["p"], xn, diff["bank"], geom, G,
                               dtype, rng)
        return {"out": out, "xn": xn}, partials(const, normed)

    def core_msda(diff, batch, aux, const, smem, tile_idx):
        rng = make_rng(smem, tile_idx, 1)
        out, normed = C.msda_bd(diff["p"], batch["xn"], diff["bank"],
                                geom, G, dtype, rng)
        return {"out": out}, partials(const, normed)

    def core_cga(diff, batch, aux, const, smem, tile_idx):
        rng = make_rng(smem, tile_idx, 2)
        out, normed = C.cga_bd(diff["p"], batch["xn"],
                               diff["bank"]["k_full"],
                               diff["bank"]["v_full"], geom, G, dtype,
                               rng)
        return {"out": out}, partials(const, normed)

    def core_cross_tail(diff, batch, aux, const, smem, tile_idx):
        rng = make_rng(smem, tile_idx, 3)
        out_cross = C.cross_bd(diff["p"], batch["xn"], diff["bank"],
                               geom, G, dtype, rng)
        y = C.tail_bd(diff["tail"], batch["x"],
                      (batch["swa"], batch["msda"], batch["cga"],
                       out_cross), geom, dtype, rng)
        return {"y": y}, {}

    return {"swa": core_swa, "msda": core_msda, "cga": core_cga,
            "cross_tail": core_cross_tail}


def _pick_tiles(b: int, target: int = 64) -> int:
    t = max(1, b // target)
    while b % t:
        t -= 1
    return t


# per-kernel batch-tile targets, swept on the v5e (scratch/
# attempt_tile_sweep.py, B=1024 flagship geometry, interleaved 30-iter
# reps): {64,32,16,32} beat the first-fit {64,64,32,64} by ~2-4% and no
# probed config beat it; targets ≥128 for msda/cross_tail fail remote
# compile (VMEM).  The CGA sweep holds [bt, kv, n, gh] f32 score/mask
# tensors (plus recompute cotangents in the bwd), so it runs at a
# quarter tile.
_TILE_TARGETS = {"swa": 64, "msda": 32, "cga": 16, "cross_tail": 32}


def _tile_targets(geom) -> dict:
    """Per-kernel batch-tile targets, scaled down with the block's token
    count so the VMEM working set stays roughly constant (the flagship
    targets above are for the 16-token geometry; tile 128 measured equal
    to 64 there).  CGA scales quadratically: its [bt, n+S, n, gh] f32
    score tensors grow ~n^2 (124 MB of bwd register spills at n=64,
    tile 8)."""
    scale = max(1, geom.n // 16)
    t = {k: max(8, v // scale) for k, v in _TILE_TARGETS.items()}
    if scale > 1:
        t["cga"] = max(4, _TILE_TARGETS["cga"] // (scale * scale))
    return t


def plan_tiles(b: int, geom) -> tuple:
    """(tiles, G) for one fused block at batch ``b``: per-kernel grid
    tile counts plus the shared G-sample group size.  Invariant (tested):
    G divides every kernel's tile size, since each kernel regroups its
    batch tile into G-sample blocks."""
    tiles = {k: _pick_tiles(b, t) for k, t in _tile_targets(geom).items()}
    G = C.pick_group(math.gcd(*(b // t for t in tiles.values())))
    return tiles, G


def _bank_heads(state, geom):
    """Raw bank rows pre-split per head (XLA-side lane surgery)."""
    h, d = geom.heads, geom.d
    s = geom.bank_s

    def split(arr):
        return arr[0].reshape(s, h, d).transpose(1, 0, 2)

    return {"k_heads": split(state.k), "v_heads": split(state.v)}


def _bank_full(state):
    return {"k_full": state.k[0], "v_full": state.v[0]}


def fused_quad_block_tpu(p: Dict[str, Any], x, state, dpr, bank_params,
                         bank_cfg, geom, dtype, train: bool,
                         rng: Optional[jax.Array], pmean_axis,
                         interpret: bool = False):
    from qavit_tpu.kernels.fused_block import finish_bank_update

    b = x.shape[0]
    tiles, G = plan_tiles(b, geom)
    prep = C.prep_block(p, geom, G)
    cores = make_cores(geom, G, jnp.dtype(dtype).name, train)
    key = (geom, G, jnp.dtype(dtype).name, train)

    smem = None
    if train and rng is not None:
        seeds = jax.vmap(
            lambda i: jax.random.key_data(jax.random.fold_in(rng, i))
        )(jnp.arange(4)).reshape(8)
        smem = {"seeds": jax.lax.bitcast_convert_type(seeds, jnp.int32),
                "dpr": jnp.asarray(dpr, jnp.float32).reshape(1)}

    def finish(state, accum):
        if not train:
            return state
        new = finish_bank_update(bank_cfg, state, accum["pk"],
                                 accum["pv"], b, pmean_axis)
        # the evolved bank feeds the NEXT unit's kernel: tag it (12 KB)
        # so the selective-remat backward does not re-run this unit's
        # forward kernel just to rebuild the bank carry
        return BankState(checkpoint_name(new.k, "fused_unit_out"),
                         checkpoint_name(new.v, "fused_unit_out"),
                         new.count)

    # write-path params are const (frozen in torch: outputs feed only
    # .data ops); the bank VALUES are diff inputs — read-gradients flow
    const = (jax.lax.stop_gradient({"bankp": bank_params}) if train
             else {})

    # Tag every cross-unit value on the unit boundary: under the model's
    # selective remat policy (save_only_these_names("fused_unit_out"),
    # nn/models.py _scan_stack) these are STORED, so the backward feeds
    # each unit's custom_vjp from saved residuals instead of re-running
    # the forward kernels.  Inert without that policy.
    tag = functools.partial(checkpoint_name, name="fused_unit_out")

    bo, ao = run_unit(
        cores["swa"], ("swa", tiles["swa"]) + key,
        {"p": prep["swa"], "norm1": prep["norm1"],
         "bank": _bank_heads(state, geom)},
        {"x": x}, {}, const,
        smem=smem, tiles=tiles["swa"], interpret=interpret)
    out_swa, xn = tag(bo["out"]), tag(bo["xn"])
    state = finish(state, ao)

    bo, ao = run_unit(
        cores["msda"], ("msda", tiles["msda"]) + key,
        {"p": prep["msda"], "bank": _bank_heads(state, geom)},
        {"xn": xn}, {}, const,
        smem=smem, tiles=tiles["msda"], interpret=interpret)
    out_msda = tag(bo["out"])
    state = finish(state, ao)

    bo, ao = run_unit(
        cores["cga"], ("cga", tiles["cga"]) + key,
        {"p": prep["cga"], "bank": _bank_full(state)},
        {"xn": xn}, {}, const,
        smem=smem, tiles=tiles["cga"], interpret=interpret)
    out_cga = tag(bo["out"])
    state = finish(state, ao)

    bo, _ = run_unit(
        cores["cross_tail"], ("cross_tail", tiles["cross_tail"]) + key,
        {"p": prep["cross"], "tail": prep["tail"],
         "bank": _bank_full(state)},
        {"x": x, "xn": xn, "swa": out_swa, "msda": out_msda,
         "cga": out_cga},
        {}, {},
        smem=smem, tiles=tiles["cross_tail"], interpret=interpret)
    return bo["y"], state
