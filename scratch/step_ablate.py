"""Ablation timing of the bench train step (round-5 perf session).

Times K=10-scanned variants of the flagship step at B=1024 so the
118.7 ms/step decomposes into attributable levers without xplane
parsing (the tensorboard profile protos are import-broken on this
host).  Variants:

  full        — the exact bench.py step
  no_opt      — fwd+bwd + clip, but optimizer/EMA update skipped
  no_mix      — mixup/cutmix off
  stem_only   — CNN stem (+LMFA) fwd+bwd microbench
  blocks_only — fwd+bwd with the stem frozen out is not separable; use
                stem_only + full instead.

Run: python scratch/step_ablate.py
"""

import time

import jax
import jax.numpy as jnp

from qavit_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from qavit_tpu.configs import get_preset  # noqa: E402
from qavit_tpu.nn import init_model  # noqa: E402
from qavit_tpu.train import (create_train_state, make_optimizer,  # noqa: E402
                             make_schedule)
from qavit_tpu.train.steps import make_scanned_train_step  # noqa: E402

K = 10
B = 1024


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def time_step(step, state, images, labels, rng, iters=5):
    for _ in range(2):
        state2, m = step(state, images, labels, rng)
    sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state2, m = step(state, images, labels, rng)
    sync(m["loss"])
    return (time.perf_counter() - t0) / (iters * K) * 1e3


def main():
    preset = get_preset("hqavit_c100")
    mc = preset.model.replace(attn_impl="fused_block")
    tc = preset.train

    model, variables = init_model(mc, jax.random.PRNGKey(0))
    spe = 50_000 // tc.batch_size
    sched = make_schedule(tc, spe)
    tx = make_optimizer(tc, spe, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"),
                               use_ema=tc.use_ema, ema_decay=tc.ema_decay)
    rng = jax.random.PRNGKey(1)
    images = jax.random.normal(rng, (K, B, 32, 32, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (K, B), 0, 100)

    results = {}
    step = make_scanned_train_step(model, tx, mc, tc, sched, num_steps=K)
    results["full"] = time_step(step, state, images, labels, rng)
    print("full:", results["full"], flush=True)

    tc_nm = tc.replace(use_mixup=False, use_cutmix=False)
    step_nm = make_scanned_train_step(model, tx, mc, tc_nm, sched,
                                      num_steps=K)
    results["no_mix"] = time_step(step_nm, state, images, labels, rng)
    print("no_mix:", results["no_mix"], flush=True)

    tc_ne = tc.replace(use_ema=False)
    tx_ne = make_optimizer(tc_ne, spe, sched)
    state_ne = create_train_state(variables["params"], tx_ne,
                                  variables.get("batch_stats"),
                                  use_ema=False)
    step_ne = make_scanned_train_step(model, tx_ne, mc, tc_ne, sched,
                                      num_steps=K)
    results["no_ema"] = time_step(step_ne, state_ne, images, labels, rng)
    print("no_ema:", results["no_ema"], flush=True)

    # stem microbench: fwd+bwd of the CNN stem alone at B=1024
    from qavit_tpu.nn.hybrid import CNNStemV1

    stem = CNNStemV1()
    sx = jax.random.normal(rng, (B, 32, 32, 3), jnp.bfloat16)
    svars = stem.init({"params": jax.random.PRNGKey(3)}, sx, train=False)

    def stem_loss(p, x):
        outs = stem.apply({"params": p, **{k: v for k, v in svars.items()
                                           if k != "params"}},
                          x, train=False)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in jax.tree_util.tree_leaves(outs))

    g = jax.jit(jax.grad(stem_loss))
    for _ in range(2):
        gg = g(svars["params"], sx)
    sync(gg)
    t0 = time.perf_counter()
    for _ in range(10):
        gg = g(svars["params"], sx)
    sync(gg)
    results["stem_fwd_bwd"] = (time.perf_counter() - t0) / 10 * 1e3
    print("stem_fwd_bwd:", results["stem_fwd_bwd"], flush=True)

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
