"""Evaluation entry point (test.py / test_hqa.py analogue).

    python -m qavit_tpu.cli.evaluate --preset hqavit_c100 \
        --checkpoint ./checkpoints/best_model [--gradcam] [--tta]

Runs: smoke forward test -> full test-set top-1/top-5 -> per-class report
-> prediction grid -> confusion matrix -> optional Grad-CAM batch and TTA
ensemble (SURVEY.md §3.4).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from qavit_tpu.utils import enable_compilation_cache


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data-root", default="./data")
    p.add_argument("--out-dir", default="./eval_out")
    p.add_argument("--gradcam", action="store_true")
    p.add_argument("--gradcam-images", type=int, default=30)
    p.add_argument("--rollout", action="store_true",
                   help="write attention-rollout overlay PNGs (pure QAViT "
                        "or hybrid TokenLearner models)")
    p.add_argument("--rollout-images", type=int, default=30)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    enable_compilation_cache()

    from qavit_tpu.ckpt import restore_train_state
    from qavit_tpu.configs import get_preset
    from qavit_tpu.data import (BatchLoader, eval_batch, get_pipeline,
                                load_dataset)
    from qavit_tpu.eval import (best_worst_classes, classification_report,
                                confusion_matrix, evaluate,
                                plot_confusion_matrix, validate_tta,
                                visualize_predictions)
    from qavit_tpu.interpret import gradcam_on_batch
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import (create_train_state, make_eval_step,
                                 make_optimizer)

    preset = get_preset(args.preset)
    mc, tc = preset.model, preset.train
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    pipe = get_pipeline(preset.dataset)
    data_root = "/nonexistent" if args.synthetic else args.data_root
    ds = load_dataset(pipe.base_dataset, data_root)

    model, variables = init_model(mc, jax.random.PRNGKey(0))
    tx = make_optimizer(tc, 10)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=False)
    if args.checkpoint:
        state, _ = restore_train_state(args.checkpoint, state)
        print(f"loaded {args.checkpoint} (step {int(state.step)})")

    # smoke test (smoke_test_forward_pass, test_hqa.py:357-368)
    dummy = jnp.zeros((2, mc.img_size, mc.img_size, 3))
    logits, _ = model.apply({"params": state.params,
                             **({"batch_stats": state.batch_stats}
                                if state.batch_stats else {})},
                            dummy, train=False, bank_count=0)
    assert logits.shape == (2, mc.num_classes), "smoke test failed"
    print("smoke test passed:", logits.shape)

    loader = BatchLoader(ds.test_images, ds.test_labels, 512,
                         shuffle=False, drop_last=False)
    eval_step = make_eval_step(model, mc)
    prep = lambda im: eval_batch(im, pipe.aug)
    r = evaluate(eval_step, state, loader, preprocess=prep,
                 collect_logits=True)
    print(f"top-1: {r['top1']:.2f}%  top-5: {r['top5']:.2f}%  "
          f"loss: {r['loss']:.4f}  n={r['count']}")

    preds = r["logits"].argmax(-1)
    labels = r["labels"]
    report = classification_report(preds, labels, mc.num_classes)
    best, worst = best_worst_classes(report, 10, ds.class_names)
    print("best classes:", best[:5])
    print("worst classes:", worst[:5])

    cm = confusion_matrix(preds, labels, mc.num_classes)
    plot_confusion_matrix(cm, str(out_dir / "confusion_matrix.png"))
    visualize_predictions(ds.test_images[:10], preds[:10], labels[:10],
                          str(out_dir / "predictions.png"), ds.class_names)
    print(f"wrote confusion_matrix.png / predictions.png to {out_dir}")

    if args.gradcam:
        imgs_u8 = ds.test_images[:args.gradcam_images]
        imgs_norm = np.asarray(eval_batch(jnp.asarray(imgs_u8), pipe.aug))
        written = gradcam_on_batch(model,
                                   {"params": state.params,
                                    **({"batch_stats": state.batch_stats}
                                       if state.batch_stats else {})},
                                   imgs_norm, imgs_u8,
                                   ds.test_labels[:args.gradcam_images],
                                   str(out_dir / "gradcam"),
                                   args.gradcam_images)
        print(f"wrote {len(written)} grad-cam pairs")

    if args.rollout and mc.hybrid and not mc.use_token_learner:
        # no positional mixing map exists for this family — fail soft so a
        # co-requested --tta still runs (interpret/rollout.py docstring)
        print("rollout skipped: hybrid models without a TokenLearner have "
              "no positional mixing map — use --gradcam instead")
    elif args.rollout:
        # attention-rollout overlays (BASELINE.json names the hook; the
        # reference repo lacks it — see interpret/rollout.py)
        from qavit_tpu.interpret import attention_rollout
        from qavit_tpu.interpret.gradcam import save_gradcam_overlay

        n_img = args.rollout_images
        imgs_u8 = ds.test_images[:n_img]
        imgs_norm = np.asarray(eval_batch(jnp.asarray(imgs_u8), pipe.aug))
        roll_vars = {"params": state.params,
                     **({"batch_stats": state.batch_stats}
                        if state.batch_stats else {})}
        n_written = 0
        for idx in range(len(imgs_u8)):
            sal = attention_rollout(model, roll_vars, imgs_norm[idx])
            pred = int(preds[idx])
            true = int(ds.test_labels[idx])
            save_gradcam_overlay(sal, np.asarray(imgs_u8[idx]),
                                 str(out_dir /
                                     f"rollout_{idx}_pred{pred}_true{true}"))
            n_written += 1
        print(f"wrote {n_written} attention-rollout pairs")

    if args.tta:
        from qavit_tpu.eval import make_tta_preprocessors

        preps = make_tta_preprocessors(pipe.aug)
        loaders = [BatchLoader(ds.test_images, ds.test_labels, 512,
                               shuffle=False, drop_last=False)
                   for _ in preps]

        def forward(state, images):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return model.apply(variables, images, train=False,
                               bank_count=0)[0]

        tta = validate_tta(jax.jit(forward), state, loaders, preps)
        print(f"TTA top-1: {tta['tta_top1']:.2f}%")

    return r


if __name__ == "__main__":
    main()
