"""jit-compiled train / eval steps.

The whole reference inner loop (HQAViT_CIFAR100.py:1366-1458) — mixing,
bf16 forward, backward, two-level clipping, AdamW, scheduler, EMA and the
bank's in-forward update — compiles into ONE XLA program per step: the TPU
replacement for autocast + GradScaler + torch.compile.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.configs.training import TrainingConfig
from qavit_tpu.train.mix import apply_mix, mixed_loss, smoothed_cross_entropy
from qavit_tpu.train.optim import apply_clipping
from qavit_tpu.train.state import TrainState, ema_update, swap_bank


def make_train_step(model, tx, mc: ModelConfig, tc: TrainingConfig,
                    schedule: Optional[Callable] = None,
                    jit: bool = True, debug_grads: bool = False):
    """Build ``train_step(state, images, targets, rng) -> (state, metrics)``.

    images: [B, H, W, C] normalised float32; targets: [B] int32.

    With ``tc.gradient_accumulation_steps = k > 1`` the batch is split into
    k micro-batches scanned inside the step: gradients average across
    micro-batches, clipping/optimizer/EMA run once on the accumulated
    gradient, while the bank and BatchNorm stats advance per micro-forward
    — exactly the reference's loss/accum + boundary-step semantics
    (HQAViT_CIFAR100.py:85, 1405-1440).
    """
    accum = max(int(getattr(tc, "gradient_accumulation_steps", 1)), 1)

    def forward_and_grad(params, batch_stats, bank_count, images, targets,
                         rng):
        rng_mix, rng_dropout = jax.random.split(rng)
        batch = apply_mix(rng_mix, images, targets, tc)
        has_bn = bool(batch_stats)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, batch.images, train=True,
                              bank_count=bank_count,
                              rngs={"dropout": rng_dropout},
                              mutable=["batch_stats"] if has_bn else False)
            if has_bn:
                (logits, bank), mut = out
                new_bs = mut["batch_stats"]
            else:
                logits, bank = out
                new_bs = batch_stats
            loss = mixed_loss(logits, batch, mc.num_classes,
                              tc.label_smoothing)
            return loss, (logits, bank, new_bs)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, images, targets, rng):
        rng = jax.random.fold_in(rng, state.step)

        if accum == 1:
            (loss, (logits, bank, new_bs)), grads = forward_and_grad(
                state.params, state.batch_stats, state.bank_count,
                images, targets, rng)
            preds = jnp.argmax(logits, axis=-1)
            correct = (preds == targets).sum()
        else:
            b = images.shape[0]
            micro = b // accum
            imgs = images[: accum * micro].reshape((accum, micro)
                                                   + images.shape[1:])
            tgts = targets[: accum * micro].reshape(accum, micro)

            def scan_body(carry, xs):
                bstats, bcount, grad_acc, loss_acc, correct_acc = carry
                im, tg, i = xs
                (l, (lg, bank_i, bs_i)), g = forward_and_grad(
                    state.params, bstats, bcount,
                    im, tg, jax.random.fold_in(rng, i))
                grad_acc = jax.tree.map(jnp.add, grad_acc, g)
                correct_acc = correct_acc + (jnp.argmax(lg, -1) == tg).sum()
                return ((bs_i, bank_i.count, grad_acc, loss_acc + l,
                         correct_acc), bank_i)

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_bs, _, grads, loss_sum, correct), banks = jax.lax.scan(
                scan_body,
                (state.batch_stats, state.bank_count, zeros,
                 jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
                (imgs, tgts, jnp.arange(accum)))
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss_sum / accum
            bank = jax.tree.map(lambda x: x[-1], banks)

        flat = bool(getattr(tc, "flat_optimizer", False))
        if not flat:
            grads, grad_norm = apply_clipping(grads, tc)

        # torch order: the bank's forward-time update is already in the
        # params when optimizer.step() runs (HQAViT_CIFAR100.py:315-321 vs
        # :1436)
        params = swap_bank(state.params, bank)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if flat:
            # the flat transform owns clipping; norms ride in its state
            grad_norm = opt_state.grad_norm

        if state.ema_params is not None:
            if flat:
                from qavit_tpu.train.flat_optim import flat_ema_update
                new_ema = flat_ema_update(state.ema_params, new_params,
                                          state.ema_decay)
            else:
                new_ema = ema_update(state.ema_params, new_params,
                                     state.ema_decay)
            new_ema_bs = new_bs  # buffers copied, not averaged (:151-156)
        else:
            new_ema, new_ema_bs = None, None

        # accuracy is measured against the un-mixed targets, as in the
        # reference (HQAViT_CIFAR100.py:1445-1448)
        metrics = {
            "loss": loss,
            "correct": correct,
            "count": jnp.asarray(targets.shape[0], jnp.int32),
            "grad_norm": grad_norm,
            "param_norm": (
                (opt_state.param_norm if flat
                 else optax.global_norm(new_params))
                if tc.log_param_norm
                else jnp.zeros((), jnp.float32)),
        }
        if debug_grads:
            # per-leaf norms feed GradientMonitor's top-layer explosion
            # report (HQAViT_CIFAR100.py:190-250).  On the flat path the
            # stats see pre-clip gradients (clipping lives inside tx).
            from qavit_tpu.obs.monitor import grad_stats
            metrics["per_leaf"] = grad_stats(grads)["per_leaf"]
        if schedule is not None:
            metrics["lr"] = schedule(state.step)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=opt_state,
            batch_stats=new_bs,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
            bank_count=bank.count,
        )
        return new_state, metrics

    if jit:
        donate = (0,) if tc.donate else ()
        train_step = jax.jit(train_step, donate_argnums=donate)
    return train_step


def make_eval_step(model, mc: ModelConfig, jit: bool = True,
                   use_ema: bool = False):
    """Build ``eval_step(state, images, targets) -> metrics`` computing
    summed loss / top-1 / top-5 for host-side aggregation
    (validate HQAViT_CIFAR100.py:1461-1482; top-5 test_hqa.py:133-164)."""

    def eval_step(state: TrainState, images, targets):
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        variables = {"params": params}
        if bs:
            variables["batch_stats"] = bs
        logits, _ = model.apply(variables, images, train=False,
                                bank_count=state.bank_count)
        # validation loss uses plain CE (no smoothing), as in the reference
        loss = smoothed_cross_entropy(logits, targets, mc.num_classes,
                                      0.0)
        top1 = (jnp.argmax(logits, -1) == targets).sum()
        top5_preds = jax.lax.top_k(logits, 5)[1]
        top5 = (top5_preds == targets[:, None]).any(axis=-1).sum()
        return {
            "loss_sum": loss.sum(),
            "top1": top1,
            "top5": top5,
            "count": jnp.asarray(targets.shape[0], jnp.int32),
            "logits": logits,
        }

    if jit:
        eval_step = jax.jit(eval_step)
    return eval_step


def make_scanned_train_step(model, tx, mc: ModelConfig, tc: TrainingConfig,
                            schedule: Optional[Callable] = None,
                            num_steps: int = 8, jit: bool = True):
    """K train steps in ONE dispatch via lax.scan.

    Removes per-step host dispatch latency entirely — the whole chunk runs
    device-side.  Input: stacked batches ``images [K, B, H, W, C]``,
    ``targets [K, B]``.  Returns (state, stacked metrics).
    """
    body = make_train_step(model, tx, mc, tc, schedule, jit=False)

    def chunk(state: TrainState, images, targets, rng):
        def scan_body(state, xs):
            imgs, tgts = xs
            state, m = body(state, imgs, tgts, rng)
            return state, m

        return jax.lax.scan(scan_body, state, (images, targets))

    if jit:
        chunk = jax.jit(chunk, donate_argnums=(0,) if tc.donate else ())
    return chunk


def make_fused_train_chunk(model, tx, mc: ModelConfig, tc: TrainingConfig,
                           aug_cfg, num_steps: int = 8,
                           schedule: Optional[Callable] = None,
                           jit: bool = True):
    """The fully-fused production path: device-side augmentation +
    mixup/cutmix + K train steps in ONE dispatch (lax.scan).

    The host only ships raw uint8 super-batches ``[K, B, H, W, 3]`` — the
    entire torchvision-worker pipeline of the reference becomes part of
    the compiled step.
    """
    from qavit_tpu.data.augment import augment_image

    body = make_train_step(model, tx, mc, tc, schedule, jit=False)

    def chunk(state: TrainState, images_u8, targets, rng):
        aug_base = jax.random.fold_in(rng, 0x5EED)

        def scan_body(state, xs):
            imgs_u8, tgts = xs
            aug_rng = jax.random.fold_in(aug_base, state.step)
            rngs = jax.random.split(aug_rng, imgs_u8.shape[0])
            images = jax.vmap(
                lambda r, im: augment_image(r, im, aug_cfg))(rngs, imgs_u8)
            state, m = body(state, images, tgts, rng)
            return state, m

        return jax.lax.scan(scan_body, state, (images_u8, targets))

    if jit:
        chunk = jax.jit(chunk, donate_argnums=(0,) if tc.donate else ())
    return chunk


def make_resident_train_chunk(model, tx, mc: ModelConfig,
                              tc: TrainingConfig, aug_cfg,
                              num_steps: int = 8,
                              schedule: Optional[Callable] = None,
                              jit: bool = True):
    """Device-RESIDENT variant of :func:`make_fused_train_chunk`.

    The whole training set lives in HBM as one uint8 array (CIFAR-scale
    datasets are ≤1.5 GB — trivial against 16 GB); the host ships only a
    ``[K, B]`` int32 index array per dispatch (~KBs).  On a tunneled or
    PCIe-attached accelerator this removes the per-epoch image upload
    entirely — the TPU-native answer to the reference's pinned-memory +
    worker-prefetch input discipline (HQAViT_CIFAR100.py:1312-1331):
    ``chunk(state, data_u8 [N,H,W,3], labels [N], idx [K,B], rng)``.

    ``data_u8``/``labels`` are passed (not closed over) so they stay
    ordinary device-resident buffers instead of program constants.
    """
    from qavit_tpu.data.augment import augment_image

    body = make_train_step(model, tx, mc, tc, schedule, jit=False)

    def chunk(state: TrainState, data_u8, labels, idx, rng):
        aug_base = jax.random.fold_in(rng, 0x5EED)

        def scan_body(state, idx_k):
            imgs_u8 = jnp.take(data_u8, idx_k, axis=0)
            tgts = jnp.take(labels, idx_k, axis=0)
            aug_rng = jax.random.fold_in(aug_base, state.step)
            rngs = jax.random.split(aug_rng, imgs_u8.shape[0])
            images = jax.vmap(
                lambda r, im: augment_image(r, im, aug_cfg))(rngs, imgs_u8)
            state, m = body(state, images, tgts, rng)
            return state, m

        return jax.lax.scan(scan_body, state, idx)

    if jit:
        chunk = jax.jit(chunk, donate_argnums=(0,) if tc.donate else ())
    return chunk


def make_resident_eval_step(model, mc: ModelConfig, aug_cfg,
                            jit: bool = True, use_ema: bool = False):
    """Device-resident eval: gather + normalize + forward in one dispatch.
    ``eval_step(state, data_u8 [N,...], labels [N], idx [B]) -> metrics``
    (host ships only the index vector)."""
    from qavit_tpu.data.augment import eval_batch

    body = make_eval_step(model, mc, jit=False, use_ema=use_ema)

    def eval_step(state: TrainState, data_u8, labels, idx):
        imgs_u8 = jnp.take(data_u8, idx, axis=0)
        tgts = jnp.take(labels, idx, axis=0)
        return body(state, eval_batch(imgs_u8, aug_cfg), tgts)

    if jit:
        eval_step = jax.jit(eval_step)
    return eval_step
