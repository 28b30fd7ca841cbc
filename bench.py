"""Benchmark: HQAViT-Tiny CIFAR-100 training throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the reference trains HQA-ViT CIFAR-100 at ~379 img/s on an
RTX-class GPU (batch 256, 195 steps in ~132 s/epoch — `log hqavit450.txt`
epoch-91 summary; BASELINE.md).  The measured number is the full training
step (device-side augmentation excluded, matching the reference whose
torchvision aug runs in host workers): mixup/cutmix, bf16 forward/backward
through all 8 quad-attention blocks + CNN stem, two-level clipping, AdamW,
EMA and the global-token-bank update, jit-compiled as one XLA program.
"""

import json
import sys
import time

from qavit_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BASELINE_IMG_PER_SEC = 379.0


def main() -> None:
    # the Pallas fused-block path is the default (7,861 img/s vs 5,659
    # on the XLA path); `python bench.py auto` benches the XLA path
    attn_impl = sys.argv[1] if len(sys.argv) > 1 else "fused_block"
    if attn_impl == "default":   # historical spelling of the dispatch
        attn_impl = "auto"
    # `python bench.py <impl> flat` benches the flat (raveled-vector)
    # AdamW+clip+EMA (same math, one update kernel instead of ~1500 —
    # equivalence pinned in tests/test_flat_optim.py).  Measured on the
    # v5e it is ~2% SLOWER inside the scanned whole-step program (121.2
    # vs 118.6 ms/step) — XLA fuses the per-leaf chain anyway and the
    # ravel/unravel adds layout copies — so the per-leaf optax chain
    # stays the benched default; flat's win is compile time and
    # dispatch-bound (unscanned) loops (docs/PERF_NOTES.md).
    flat = len(sys.argv) > 2 and sys.argv[2] == "flat"
    from qavit_tpu.configs import get_preset
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import (create_train_state, make_optimizer,
                                 make_schedule)
    from qavit_tpu.train.steps import make_scanned_train_step

    preset = get_preset("hqavit_c100")
    mc, tc = preset.model, preset.train
    mc = mc.replace(attn_impl=attn_impl)
    tc = tc.replace(flat_optimizer=flat)

    model, variables = init_model(mc, jax.random.PRNGKey(0))
    steps_per_epoch = 50_000 // tc.batch_size
    sched = make_schedule(tc, steps_per_epoch)
    tx = make_optimizer(tc, steps_per_epoch, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"),
                               use_ema=tc.use_ema, ema_decay=tc.ema_decay)
    # K steps per dispatch (lax.scan) so the measurement is pure device
    # throughput, not tunnel dispatch latency
    k = 10
    step = make_scanned_train_step(model, tx, mc, tc, sched, num_steps=k)

    batch = 1024  # single-chip throughput peaks past the reference's 256
    rng = jax.random.PRNGKey(1)
    images = jax.random.normal(rng, (k, batch, 32, 32, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (k, batch), 0, 100)

    # warmup / compile.  NOTE: on the axon remote backend
    # block_until_ready does not truly block; a scalar fetch from the
    # final output is the only reliable sync, so timing ends with one.
    for _ in range(2):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"][-1])

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"][-1])
    dt = (time.perf_counter() - t0) / (iters * k)

    img_per_sec = batch / dt

    # MFU: analytic fwd FLOPs x3 (fwd + ~2x bwd) vs the v5e's 197 bf16
    # TFLOP/s peak (VERDICT r2 #1: report MFU alongside img/s)
    from qavit_tpu.obs.analyzer import analytic_flops
    train_flops = 3.0 * analytic_flops(mc, batch=batch)["total"]
    mfu = train_flops / dt / 197e12

    # eval throughput (VERDICT r2 #7): fwd-only jit'd eval step, B=2048
    from qavit_tpu.train import make_eval_step
    eval_step = make_eval_step(model, mc)
    state_e = state
    eb = 2048
    ex = jax.random.normal(rng, (eb, 32, 32, 3), jnp.float32)
    ey = jnp.zeros((eb,), jnp.int32)
    for _ in range(2):
        em = eval_step(state_e, ex, ey)
    float(em["loss_sum"])
    t0 = time.perf_counter()
    for _ in range(10):
        em = eval_step(state_e, ex, ey)
    float(em["loss_sum"])
    edt = (time.perf_counter() - t0) / 10
    eval_img_per_sec = eb / edt

    print(json.dumps({
        "metric": "HQAViT-Tiny CIFAR-100 train throughput (1 chip, B=1024)",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
        "ms_per_step": round(dt * 1e3, 1),
        "mfu_pct": round(100 * mfu, 2),
        "eval_img_per_sec": round(eval_img_per_sec, 1),
    }))


def main_with_retry(attempts: int = 3) -> None:
    """Retry wrapper: the axon remote-compile tunnel occasionally drops a
    response mid-read (BENCH_r04 was an rc=1 `read body: response body
    closed before all bytes were read` — the bench itself was healthy and
    reproduced the round-3 number on rerun).  A transient transport error
    must not become the round's recorded perf result, so transient
    runtime errors restart the measurement (compile cache makes a retry
    cheap)."""
    import traceback

    delays = [10, 30]
    for attempt in range(attempts):
        try:
            main()
            return
        except Exception as e:  # noqa: BLE001 — classify, then re-raise
            msg = f"{type(e).__name__}: {e}"
            transient = any(s in msg for s in (
                "remote_compile", "read body", "INTERNAL",
                "UNAVAILABLE", "DEADLINE_EXCEEDED", "Connection",
                "Socket closed"))
            if not transient or attempt == attempts - 1:
                raise
            traceback.print_exc(file=sys.stderr)
            delay = delays[min(attempt, len(delays) - 1)]
            print(f"bench: transient backend error (attempt "
                  f"{attempt + 1}/{attempts}), retrying in {delay}s",
                  file=sys.stderr)
            time.sleep(delay)


if __name__ == "__main__":
    main_with_retry()
