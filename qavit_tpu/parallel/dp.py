"""Data-parallel training over an ICI mesh.

Two equivalent paths are provided (SURVEY.md §2.10, §5.8):

* :func:`make_gspmd_train_step` — the default: the single-chip train step
  jitted with NamedShardings (batch split over ``data``, state replicated).
  XLA/GSPMD inserts the gradient all-reduce; the bank's batch-mean update
  is automatically global because the mean spans the sharded batch.

* :func:`make_shardmap_train_step` — explicit-collectives variant using
  ``shard_map``: per-device loss/grads with ``psum`` for gradients and
  metrics, and the bank update ``pmean``-ed over the data axis (the model
  is built with ``pmean_axis=DATA_AXIS``).  This is the path that makes
  every collective visible for profiling.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.configs.training import TrainingConfig
from qavit_tpu.parallel.mesh import DATA_AXIS
from qavit_tpu.train.mix import apply_mix, mixed_loss
from qavit_tpu.train.optim import apply_clipping
from qavit_tpu.train.state import TrainState, ema_update, swap_bank


def make_gspmd_train_step(model, tx, mc: ModelConfig, tc: TrainingConfig,
                          mesh: Mesh,
                          schedule: Optional[Callable] = None,
                          debug_grads: bool = False):
    """jit + NamedSharding data parallelism (GSPMD inserts collectives).

    The single-chip step features compose here unchanged (tested on the
    8-device virtual mesh): ``tc.gradient_accumulation_steps`` splits the
    per-device shard into micro-batches inside the jitted body, and
    ``debug_grads`` adds the per-leaf gradient-norm metrics.  The
    shard_map variant below does NOT take them — it is the
    explicit-collectives profiling path; use GSPMD (the default) when
    accumulation or per-leaf monitoring is needed under a mesh.
    """
    from qavit_tpu.train.steps import make_train_step

    step = make_train_step(model, tx, mc, tc, schedule, jit=False,
                           debug_grads=debug_grads)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if tc.donate else (),
    )


def make_shardmap_train_step(model, tx, mc: ModelConfig, tc: TrainingConfig,
                             mesh: Mesh,
                             schedule: Optional[Callable] = None):
    """Explicit shard_map data-parallel step with psum'd gradients.

    ``model`` must be built with ``pmean_axis=DATA_AXIS`` so the bank's
    write update averages over the global batch.
    """

    def per_device_step(state: TrainState, images, targets, rng):
        # identical mixing RNG on every device would correlate the shards;
        # fold in the device index
        dev = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), dev)
        rng_mix, rng_dropout = jax.random.split(rng)
        batch = apply_mix(rng_mix, images, targets, tc)

        has_bn = bool(state.batch_stats)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, batch.images, train=True,
                              bank_count=state.bank_count,
                              rngs={"dropout": rng_dropout},
                              mutable=["batch_stats"] if has_bn else False)
            if has_bn:
                (logits, bank), mut = out
                new_bs = mut["batch_stats"]
            else:
                logits, bank = out
                new_bs = state.batch_stats
            loss = mixed_loss(logits, batch, mc.num_classes,
                              tc.label_smoothing)
            return loss, (logits, bank, new_bs)

        (loss, (logits, bank, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # the explicit data-parallel all-reduce over ICI
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        if has_bn:
            new_bs = jax.lax.pmean(new_bs, DATA_AXIS)

        flat = bool(getattr(tc, "flat_optimizer", False))
        if not flat:
            grads, grad_norm = apply_clipping(grads, tc)
        params = swap_bank(state.params, bank)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if flat:
            grad_norm = opt_state.grad_norm

        if state.ema_params is not None:
            if flat:
                from qavit_tpu.train.flat_optim import flat_ema_update
                new_ema = flat_ema_update(state.ema_params, new_params,
                                          state.ema_decay)
            else:
                new_ema = ema_update(state.ema_params, new_params,
                                     state.ema_decay)
            new_ema_bs = new_bs
        else:
            new_ema, new_ema_bs = None, None

        preds = jnp.argmax(logits, axis=-1)
        correct = jax.lax.psum((preds == targets).sum(), DATA_AXIS)
        count = jax.lax.psum(jnp.asarray(targets.shape[0], jnp.int32),
                             DATA_AXIS)

        metrics = {"loss": loss, "correct": correct, "count": count,
                   "grad_norm": grad_norm,
                   "param_norm": (
                       (opt_state.param_norm if flat
                        else optax.global_norm(new_params))
                       if tc.log_param_norm
                       else jnp.zeros((), jnp.float32))}
        if schedule is not None:
            metrics["lr"] = schedule(state.step)

        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=opt_state,
            batch_stats=new_bs, ema_params=new_ema,
            ema_batch_stats=new_ema_bs, bank_count=bank.count)
        return new_state, metrics

    state_specs = P()     # replicated state
    batch_specs = P(DATA_AXIS)
    shmapped = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(state_specs, batch_specs, batch_specs, state_specs),
        out_specs=(state_specs, state_specs),
        check_vma=False,
    )
    return jax.jit(shmapped, donate_argnums=(0,) if tc.donate else ())


def make_gspmd_train_chunk(model, tx, mc: ModelConfig, tc: TrainingConfig,
                           aug_cfg, mesh: Mesh, num_steps: int = 8,
                           schedule: Optional[Callable] = None):
    """The fused aug+K-step chunk under GSPMD data parallelism.

    Same one-dispatch path as the single-chip
    :func:`~qavit_tpu.train.steps.make_fused_train_chunk` — raw uint8
    super-batches [K, B, H, W, 3] with device-side augmentation — but the
    per-step batch axis is sharded over the ``data`` mesh axis, so
    multi-chip runs keep the fused-dispatch throughput (lifts the r1
    single-chip restriction, VERDICT #5).
    """
    from qavit_tpu.train.steps import make_fused_train_chunk

    chunk = make_fused_train_chunk(model, tx, mc, tc, aug_cfg,
                                   num_steps=num_steps, schedule=schedule,
                                   jit=False)
    repl = NamedSharding(mesh, P())
    super_sh = NamedSharding(mesh, P(None, DATA_AXIS))  # [K, B, ...]
    return jax.jit(
        chunk,
        in_shardings=(repl, super_sh, super_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if tc.donate else (),
    )


def make_dp_eval_step(model, mc: ModelConfig, mesh: Mesh,
                      use_ema: bool = False):
    """Sharded eval step (GSPMD)."""
    from qavit_tpu.train.steps import make_eval_step

    step = make_eval_step(model, mc, jit=False, use_ema=use_ema)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(repl, batch_sh, batch_sh))
