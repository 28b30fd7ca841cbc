"""Performance analysis CLI (run_performance_tests / compile_and_test_model
analogue, QAViTv2.py:1110-1203).

    python -m qavit_tpu.cli.bench --preset hqavit_c100 [--train]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from qavit_tpu.utils import enable_compilation_cache


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="hqavit_c100")
    p.add_argument("--train", action="store_true",
                   help="benchmark the train step instead of inference")
    p.add_argument("--tta", action="store_true",
                   help="benchmark the 5-view TTA ensemble (uint8 in, "
                        "softmax-averaged probs out) instead of the "
                        "plain forward")
    p.add_argument("--batch-sizes", default="64,256,1024")
    args = p.parse_args(argv)
    enable_compilation_cache()

    from qavit_tpu.configs import get_preset
    from qavit_tpu.nn import init_model
    from qavit_tpu.obs import (batch_size_sweep, device_memory_stats,
                               print_analysis)
    from qavit_tpu.train import (create_train_state, make_optimizer,
                                 make_schedule, make_train_step)

    preset = get_preset(args.preset)
    mc, tc = preset.model, preset.train
    model, variables = init_model(mc, jax.random.PRNGKey(0))
    print_analysis(mc, variables["params"])

    if args.train:
        sched = make_schedule(tc, 100)
        tx = make_optimizer(tc, 100, sched)
        state = create_train_state(variables["params"], tx,
                                   variables.get("batch_stats"),
                                   use_ema=tc.use_ema)
        step = make_train_step(model, tx, mc, tc, sched)

        def fn(images, labels):
            _, m = step(state, images, labels, jax.random.PRNGKey(0))
            return m["loss"]
    elif args.tta:
        # the reference's eval-side latency harness times inference;
        # this is the 5-view ensemble actually used for headline
        # accuracy (run_performance_tests, QAViTv2.py:1153-1203 +
        # HQAViT_C100_Finetune.py:106-132)
        from qavit_tpu.data.pipelines import get_pipeline
        from qavit_tpu.eval.tta import make_tta_preprocessors
        aug_cfg = get_pipeline(preset.dataset).aug
        preps = make_tta_preprocessors(aug_cfg)
        fwd = jax.jit(lambda v, x: jax.nn.softmax(
            model.apply(v, x, train=False, bank_count=0)[0]))

        def fn(images, labels):
            probs = 0.0
            for prep in preps:
                probs = probs + fwd(variables, prep(images))
            return probs

        def make_batch(bs):
            return (jax.random.randint(
                jax.random.PRNGKey(1),
                (bs, mc.img_size, mc.img_size, 3), 0, 256, jnp.uint8),
                jnp.zeros((bs,), jnp.int32))
    else:
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False,
                                               bank_count=0)[0])

        def fn(images, labels):
            return fwd(variables, images)

    if not args.tta:
        def make_batch(bs):
            return (jax.random.normal(jax.random.PRNGKey(1),
                                      (bs, mc.img_size, mc.img_size, 3)),
                    jnp.zeros((bs,), jnp.int32))

    sizes = [int(s) for s in args.batch_sizes.split(",")]
    rows = batch_size_sweep(make_batch, fn, sizes)
    for row in rows:
        print(json.dumps(row))
    mem = device_memory_stats()
    if mem:
        print(json.dumps({"device_memory": mem}))


if __name__ == "__main__":
    main()
