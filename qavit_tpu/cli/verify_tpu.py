"""TPU bring-up verification (verify_gpu.py analogue — the reference's is
broken; this one works against the real factories).

    python -m qavit_tpu.cli.verify_tpu [--preset hqavit_c100]

Checks: device availability -> Pallas kernel availability + parity ->
batch-size sweep (fwd + fwd/bwd, OOM-safe) -> 3-step training loop with a
throughput estimate (verify_gpu.py:17-247 intent).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from qavit_tpu.utils import enable_compilation_cache


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="hqavit_c100")
    p.add_argument("--batch-sizes", default="64,256,1024")
    args = p.parse_args(argv)
    enable_compilation_cache()

    print("=" * 70)
    print("1) Device check")
    print("=" * 70)
    devices = jax.devices()
    print(f"backend: {jax.default_backend()}  devices: {devices}")
    ok_device = len(devices) >= 1

    print("\n" + "=" * 70)
    print("2) Pallas fused-attention check")
    print("=" * 70)
    ok_pallas = False
    try:
        from qavit_tpu.kernels import flash_attention, xla_attention

        q = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 48))
        k = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 48))
        v = jax.random.normal(jax.random.PRNGKey(2), (4, 48, 48))
        interpret = jax.default_backend() != "tpu"
        out = flash_attention(q, k, v, interpret=interpret)
        ref = xla_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        err = float(jnp.max(jnp.abs(out - ref)))
        ok_pallas = err < 1e-3
        print(f"pallas kernel max err vs XLA: {err:.2e} "
              f"({'OK' if ok_pallas else 'FAIL'})")
    except Exception as e:  # noqa: BLE001
        print(f"pallas unavailable: {e}")

    print("\n" + "=" * 70)
    print("3) Batch-size sweep (fwd + grad)")
    print("=" * 70)
    from qavit_tpu.configs import get_preset
    from qavit_tpu.nn import init_model
    from qavit_tpu.obs import batch_size_sweep, device_memory_stats
    from qavit_tpu.train.mix import smoothed_cross_entropy

    preset = get_preset(args.preset)
    mc = preset.model
    model, variables = init_model(mc, jax.random.PRNGKey(0))

    @jax.jit
    def fwd_bwd(variables, x, y):
        def loss_fn(params):
            out = model.apply(
                {"params": params,
                 **({"batch_stats": variables["batch_stats"]}
                    if variables.get("batch_stats") else {})},
                x, train=False, bank_count=0)
            return smoothed_cross_entropy(out[0], y, mc.num_classes,
                                          0.0).mean()
        return jax.grad(loss_fn)(variables["params"])

    def make_batch(bs):
        return (variables,
                jax.random.normal(jax.random.PRNGKey(1),
                                  (bs, mc.img_size, mc.img_size, 3)),
                jnp.zeros((bs,), jnp.int32))

    sizes = [int(s) for s in args.batch_sizes.split(",")]
    for row in batch_size_sweep(make_batch, fwd_bwd, sizes):
        print(row)
    mem = device_memory_stats()
    if mem:
        print(f"device memory: {mem}")

    print("\n" + "=" * 70)
    print("4) 3-step training test")
    print("=" * 70)
    from qavit_tpu.train import (create_train_state, make_optimizer,
                                 make_schedule, make_train_step)

    tc = preset.train
    sched = make_schedule(tc, 100)
    tx = make_optimizer(tc, 100, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"),
                               use_ema=tc.use_ema)
    step = make_train_step(model, tx, mc, tc, sched)
    bs = 256
    x = jax.random.normal(jax.random.PRNGKey(3), (bs, mc.img_size,
                                                  mc.img_size, 3))
    y = jax.random.randint(jax.random.PRNGKey(4), (bs,), 0, mc.num_classes)
    losses = []
    t0 = None
    for i in range(3):
        state, m = step(state, x, y, jax.random.PRNGKey(5))
        jax.block_until_ready(m["loss"])
        losses.append(float(m["loss"]))
        if i == 0:
            t0 = time.perf_counter()
    dt = (time.perf_counter() - t0) / 2
    print(f"losses: {losses}")
    print(f"throughput estimate: {bs / dt:.0f} img/s")
    ok_train = all(jnp.isfinite(jnp.asarray(losses)))

    print("\n" + "=" * 70)
    verdict = ok_device and ok_train
    print(f"VERDICT: {'PASS' if verdict else 'FAIL'} "
          f"(device={ok_device} pallas={ok_pallas} train={ok_train})")
    return verdict


if __name__ == "__main__":
    main()
