"""Generic batch-tiled Pallas runner for fused-block units.

A *unit* is a pure function ``core(diff, batch, aux, const, smem,
tile_idx) -> (batch_outs, accum_outs)`` over pytrees of arrays:

* ``diff``   — broadcast to every tile (block weights, bank state);
  differentiable, gradients ACCUMULATED across tiles in fp32.
* ``batch``  — leading dim is the (per-leaf) batch; sliced per tile;
  differentiable, gradients sliced back.
* ``aux``    — batch-sliced, non-differentiable.
* ``const``  — broadcast, non-differentiable (shared constants).
* ``smem``   — dict of small 1-D arrays placed in SMEM; the core
  receives each as a tuple of SCALARS (PRNG seeds, traced rates).
* ``tile_idx`` — the grid index (``pl.program_id``), for per-tile PRNG
  seeding.
* ``batch_outs`` — per-tile outputs concatenated over tiles.
* ``accum_outs`` — per-tile partial SUMS accumulated across tiles (the
  bank-write partials of qavit_tpu/kernels/fused_ref.bank_write_partial).

``run_unit`` executes the core as ONE ``pl.pallas_call`` with a grid over
batch tiles (weights live in VMEM for the whole sweep; TPU grids run
sequentially so `+=` accumulation across tiles is race-free), wrapped in a
``jax.custom_vjp`` whose backward is a second Pallas kernel that calls
``jax.vjp(core)`` *inside* the kernel — recompute-in-VMEM instead of
storing residuals to HBM, the Pallas analogue of the remat insight in
docs/PERF_NOTES.md.  In-kernel RNG draws replay identically in the
backward because both kernels rebuild the counter-hash provider from the
same smem seeds and tile_idx.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu imports fail on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

flatten = jax.tree_util.tree_flatten
unflatten = jax.tree_util.tree_unflatten


def _bcast_spec(shape, space=None):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                        memory_space=space or _VMEM)


def _tile_spec(shape, tiles: int):
    """Slice dim 0 into ``tiles`` blocks (per-leaf tile size)."""
    nd = len(shape)
    bt = shape[0] // tiles
    return pl.BlockSpec((bt,) + tuple(shape[1:]),
                        lambda i, _n=nd: (i,) + (0,) * (_n - 1),
                        memory_space=_VMEM)


def _tile_struct(x, tiles: int):
    return jax.ShapeDtypeStruct((x.shape[0] // tiles,) + x.shape[1:],
                                x.dtype)


def _write_outs(i, out_refs, batch_vals, accum_vals):
    n_b = len(batch_vals)
    for r, v in zip(out_refs[:n_b], batch_vals):
        r[...] = v
    for r, v in zip(out_refs[n_b:], accum_vals):
        def _init(r=r, v=v):
            r[...] = v

        def _acc(r=r, v=v):
            r[...] = r[...] + v

        pl.when(i == 0)(_init)
        pl.when(i > 0)(_acc)


def _float0_like(tree):
    return jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), tree)


def _scalars(td, refs_or_arrs, shapes):
    """SMEM leaves -> pytree of per-element scalar tuples."""
    vals = [tuple(r[i] for i in range(s.shape[0]))
            for r, s in zip(refs_or_arrs, shapes)]
    return unflatten(td, vals)


def _interp(interpret: bool):
    # plain interpret mode: effect-free (the cores use a jnp counter-hash
    # RNG, not the pltpu PRNG), so the kernels stay remat-compatible
    return bool(interpret)


# v5e has 128 MiB of physical VMEM; Mosaic's default 16 MiB scoped limit
# is too small for the whole-block working set at the default tile size
_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params(interpret: bool):
    if interpret or pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


@functools.lru_cache(maxsize=None)
def _build_unit(core_key: Tuple, core: Callable, tiles: int,
                diff_td, batch_td, aux_td, const_td, smem_td,
                diff_shapes, batch_shapes, aux_shapes, const_shapes,
                smem_shapes, interpret: bool):
    """Compile-cache the custom_vjp-wrapped unit for one (core, shapes)
    signature.  All hashable; arrays enter at call time."""
    del core_key  # only part of the cache key

    def _tree(td, structs):
        return unflatten(td, list(structs))

    diff_s = _tree(diff_td, diff_shapes)
    batch_s = _tree(batch_td, batch_shapes)
    aux_s = _tree(aux_td, aux_shapes)
    const_s = _tree(const_td, const_shapes)
    batch_tile_s = jax.tree_util.tree_map(
        lambda s: _tile_struct(s, tiles), batch_s)
    aux_tile_s = jax.tree_util.tree_map(
        lambda s: _tile_struct(s, tiles), aux_s)
    smem_scalar_s = unflatten(smem_td, [
        tuple(jax.ShapeDtypeStruct((), s.dtype)
              for _ in range(s.shape[0])) for s in smem_shapes])

    out_s = jax.eval_shape(core, diff_s, batch_tile_s, aux_tile_s,
                           const_s, smem_scalar_s,
                           jax.ShapeDtypeStruct((), jnp.int32))
    bo_s, ao_s = out_s
    bo_leaves, bo_td = flatten(bo_s)
    ao_leaves, ao_td = flatten(ao_s)
    n_diff = len(diff_shapes)
    n_batch = len(batch_shapes)
    n_aux = len(aux_shapes)
    n_const = len(const_shapes)
    n_smem = len(smem_shapes)
    n_bo = len(bo_leaves)
    n_in = n_diff + n_batch + n_aux + n_const + n_smem

    fwd_out_shape = ([jax.ShapeDtypeStruct((s.shape[0] * tiles,)
                                           + s.shape[1:], s.dtype)
                      for s in bo_leaves]
                     + [jax.ShapeDtypeStruct(s.shape, s.dtype)
                        for s in ao_leaves])
    fwd_in_specs = ([_bcast_spec(s.shape) for s in diff_shapes]
                    + [_tile_spec(s.shape, tiles) for s in batch_shapes]
                    + [_tile_spec(s.shape, tiles) for s in aux_shapes]
                    + [_bcast_spec(s.shape) for s in const_shapes]
                    + [_bcast_spec(s.shape, _SMEM) for s in smem_shapes])
    fwd_out_specs = ([_tile_spec((s.shape[0] * tiles,) + s.shape[1:],
                                 tiles) for s in bo_leaves]
                     + [_bcast_spec(s.shape) for s in ao_leaves])

    def _parse_ins(ins):
        k = 0
        diff = unflatten(diff_td, [r[...] for r in ins[k:k + n_diff]])
        k += n_diff
        batch = unflatten(batch_td, [r[...] for r in ins[k:k + n_batch]])
        k += n_batch
        aux = unflatten(aux_td, [r[...] for r in ins[k:k + n_aux]])
        k += n_aux
        const = unflatten(const_td, [r[...] for r in ins[k:k + n_const]])
        k += n_const
        smem = _scalars(smem_td, ins[k:k + n_smem], smem_shapes)
        return diff, batch, aux, const, smem

    def fwd_kernel(*refs):
        i = pl.program_id(0)
        ins, outs = refs[:n_in], refs[n_in:]
        diff, batch, aux, const, smem = _parse_ins(ins)
        bo, ao = core(diff, batch, aux, const, smem, i)
        _write_outs(i, outs, flatten(bo)[0], flatten(ao)[0])

    def fwd_call(diff_l, batch_l, aux_l, const_l, smem_l):
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(tiles,),
            out_shape=fwd_out_shape,
            in_specs=fwd_in_specs,
            out_specs=fwd_out_specs,
            interpret=_interp(interpret),
            compiler_params=_compiler_params(interpret),
        )(*diff_l, *batch_l, *aux_l, *const_l, *smem_l)
        return (unflatten(bo_td, list(outs[:n_bo])),
                unflatten(ao_td, list(outs[n_bo:])))

    # ---- backward: recompute + jax.vjp inside the kernel -------------
    ddiff_shape = [jax.ShapeDtypeStruct(s.shape, jnp.float32)
                   for s in diff_shapes]
    dbatch_shape = [jax.ShapeDtypeStruct(s.shape, s.dtype)
                    for s in batch_shapes]
    bwd_in_specs = (fwd_in_specs
                    + [_tile_spec((s.shape[0] * tiles,) + s.shape[1:],
                                  tiles) for s in bo_leaves]
                    + [_bcast_spec(s.shape) for s in ao_leaves])
    bwd_out_specs = ([_bcast_spec(s.shape) for s in ddiff_shape]
                     + [_tile_spec(s.shape, tiles) for s in dbatch_shape])

    def bwd_kernel(*refs):
        i = pl.program_id(0)
        n_all = n_in + n_bo + len(ao_leaves)
        ins, outs = refs[:n_all], refs[n_all:]
        diff, batch, aux, const, smem = _parse_ins(ins[:n_in])
        k = n_in
        cbo = unflatten(bo_td, [r[...] for r in ins[k:k + n_bo]])
        k += n_bo
        cao = unflatten(ao_td, [r[...] for r in ins[k:]])

        def f(d, b):
            return core(d, b, aux, const, smem, i)

        _, vjp = jax.vjp(f, diff, batch)
        dd, db = vjp((cbo, cao))
        dd_l = [v.astype(jnp.float32) for v in flatten(dd)[0]]
        db_l = flatten(db)[0]
        for r, v in zip(outs[n_diff:], db_l):
            r[...] = v.astype(r.dtype)
        for r, v in zip(outs[:n_diff], dd_l):
            def _init(r=r, v=v):
                r[...] = v

            def _acc(r=r, v=v):
                r[...] = r[...] + v

            pl.when(i == 0)(_init)
            pl.when(i > 0)(_acc)

    def bwd_call(diff_l, batch_l, aux_l, const_l, smem_l, cbo_l, cao_l):
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(tiles,),
            out_shape=ddiff_shape + dbatch_shape,
            in_specs=bwd_in_specs,
            out_specs=bwd_out_specs,
            interpret=_interp(interpret),
            compiler_params=_compiler_params(interpret),
        )(*diff_l, *batch_l, *aux_l, *const_l, *smem_l, *cbo_l, *cao_l)
        dd = [o.astype(s.dtype) for o, s in zip(outs[:n_diff],
                                                diff_shapes)]
        return dd, list(outs[n_diff:])

    @jax.custom_vjp
    def unit(diff, batch, aux, const, smem):
        return fwd_call(flatten(diff)[0], flatten(batch)[0],
                        flatten(aux)[0], flatten(const)[0],
                        flatten(smem)[0])

    def unit_fwd(diff, batch, aux, const, smem):
        out = unit(diff, batch, aux, const, smem)
        return out, (diff, batch, aux, const, smem)

    def unit_bwd(res, cots):
        diff, batch, aux, const, smem = res
        cbo, cao = cots
        dd_l, db_l = bwd_call(flatten(diff)[0], flatten(batch)[0],
                              flatten(aux)[0], flatten(const)[0],
                              flatten(smem)[0],
                              flatten(cbo)[0], flatten(cao)[0])
        return (unflatten(flatten(diff)[1], dd_l),
                unflatten(flatten(batch)[1], db_l),
                _float0_like(aux), _float0_like(const),
                _float0_like(smem))

    unit.defvjp(unit_fwd, unit_bwd)
    return unit


def run_unit(core: Callable, name: Any, diff: Any, batch: Any, aux: Any,
             const: Any = None, smem: Any = None, *, tiles: int,
             interpret: bool = False):
    """Run ``core(diff, batch, aux, const, smem, tile_idx)`` as a
    batch-tiled Pallas kernel (see module doc).

    ``core`` must be a module-level function or a cached closure —
    it is part of an ``lru_cache`` key together with ``name``.
    """
    const = {} if const is None else const
    smem = {} if smem is None else smem
    diff_l, diff_td = flatten(diff)
    batch_l, batch_td = flatten(batch)
    aux_l, aux_td = flatten(aux)
    const_l, const_td = flatten(const)
    smem_l, smem_td = flatten(smem)

    def structs(leaves):
        return tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                     for x in leaves)

    unit = _build_unit((name, tiles, interpret), core, tiles,
                       diff_td, batch_td, aux_td, const_td, smem_td,
                       structs(diff_l), structs(batch_l),
                       structs(aux_l), structs(const_l),
                       structs(smem_l), interpret)
    return unit(diff, batch, aux, const, smem)
