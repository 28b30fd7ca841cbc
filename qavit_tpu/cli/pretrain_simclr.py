"""SimCLR pretraining entry point (reconstructed STL-10 pipeline).

    python -m qavit_tpu.cli.pretrain_simclr [--epochs N] [--synthetic]

Matches the recovered run metadata: 5-epoch linear LR warmup 0.0141 ->
0.0424 peak, cosine decay, NT-Xent (logs_stl10_simclr, SURVEY.md §0).
Saves the backbone checkpoint for qavit_tpu.cli.train --init-from.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from qavit_tpu.utils import enable_compilation_cache


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=7)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--peak-lr", type=float, default=None,
                   help="default is substrate-appropriate: 0.0424 for real "
                        "STL-10 (recovered run metadata) but 0.005 for the "
                        "proc substrates — the r3 sweep (logs/simclr_r3) "
                        "showed 0.0424 collapses NT-Xent to the saddle on "
                        "proc_stl by epoch 2")
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--init-from", default=None,
                   help="continue from a prior simclr_epoch_N checkpoint "
                        "(params + optimizer moments restored, schedule "
                        "restarts — SGDR-style chained pretraining that "
                        "reuses the compiled 5-epoch program instead of "
                        "recompiling a longer schedule)")
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--data-root", default="./data")
    p.add_argument("--log-dir", default="./logs_simclr")
    p.add_argument("--checkpoint-dir", default="./checkpoints_simclr")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--pipeline", default="stl10_unlabeled",
                   choices=["stl10_unlabeled", "proc_stl_unlabeled",
                            "proc_stl50k_unlabeled"],
                   help="two-view aug pipeline + dataset; proc_stl is "
                        "the no-egress 96px procedural substrate, "
                        "proc_stl50k the 50k winning-regime pool")
    p.add_argument("--max-steps-per-epoch", type=int, default=None)
    args = p.parse_args(argv)
    if args.peak_lr is None:
        args.peak_lr = (0.0424 if args.pipeline == "stl10_unlabeled"
                        else 0.005)
        print(f"peak LR (substrate default): {args.peak_lr}")
    enable_compilation_cache()

    import optax

    from qavit_tpu.ckpt import save_train_state
    from qavit_tpu.configs import get_preset
    from qavit_tpu.data import BatchLoader, augment_batch, get_pipeline, \
        load_dataset
    from qavit_tpu.obs import TrainingLogger
    from qavit_tpu.train import create_train_state
    from qavit_tpu.train.simclr import SimCLRNet, make_simclr_train_step

    preset = get_preset("simclr_stl10")
    mc = preset.model
    pipe = get_pipeline(args.pipeline)
    data_root = "/nonexistent" if args.synthetic else args.data_root
    ds = load_dataset(pipe.base_dataset, data_root)
    if ds.synthetic:
        print("WARNING: synthetic data")

    loader_cls = BatchLoader
    if jax.process_count() == 1:
        from qavit_tpu import native
        if native.is_available():
            loader_cls = native.NativeBatchLoader
            print("loader: native C++ ring batcher")
    loader = loader_cls(ds.train_images, ds.train_labels, args.batch_size,
                        shuffle=True, seed=0)
    steps_per_epoch = len(loader)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)

    model = SimCLRNet(mc)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, mc.img_size, mc.img_size, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng}, dummy, train=True)

    total = max(steps_per_epoch * args.epochs, 2)
    warm = min(steps_per_epoch * args.warmup_epochs, total - 1)
    # observed: warmup starts at ~1/3 of peak (0.0141 of 0.0424)
    sched = optax.warmup_cosine_decay_schedule(
        init_value=args.peak_lr / 3, peak_value=args.peak_lr,
        warmup_steps=warm, decay_steps=total, end_value=1e-6)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-6))
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=False)
    if args.init_from:
        from qavit_tpu.ckpt import restore_train_state

        state, _ = restore_train_state(args.init_from, state)
        state = state.replace(step=0)   # fresh (restarted) schedule
        print(f"simclr: continuing from {args.init_from}")
    step = make_simclr_train_step(model, tx, preset.train,
                                  args.temperature, sched)

    logger = TrainingLogger(args.log_dir)
    rng_aug = jax.random.PRNGKey(1)
    host_step = 0
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        loss_sum, n = 0.0, 0
        for i, (images_u8, _) in enumerate(loader):
            if i >= steps_per_epoch:
                break
            r1 = jax.random.fold_in(rng_aug, 2 * host_step)
            r2 = jax.random.fold_in(rng_aug, 2 * host_step + 1)
            host_step += 1
            v1 = augment_batch(r1, images_u8, pipe.aug)
            v2 = augment_batch(r2, images_u8, pipe.aug)
            state, m = step(state, v1, v2, rng)
            loss_sum += float(m["loss"])
            n += 1
            if i % 50 == 0:
                print(f"Epoch {epoch} [{i}/{steps_per_epoch}] "
                      f"NT-Xent: {loss_sum / n:.4f} "
                      f"LR: {float(m['lr']):.4f}")
        metrics = {"train_loss": loss_sum / max(n, 1),
                   "lr": float(sched(state.step)),
                   "epoch_time": time.time() - t0}
        logger.log_epoch(epoch, metrics)
        logger.save()
        print(f"Epoch {epoch}: NT-Xent {metrics['train_loss']:.4f} "
              f"({metrics['epoch_time']:.0f}s)")
        save_train_state(f"{args.checkpoint_dir}/simclr_epoch_{epoch}",
                         state, mc)
    logger.plot()
    print("SimCLR pretrain complete")


if __name__ == "__main__":
    main()
