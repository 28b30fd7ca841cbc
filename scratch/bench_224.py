"""TPU microbench at 224px geometry (VERDICT r2 #2's last sliver).

Times the qavit_224_v1 preset (n=196 tokens, window 7 -> nw=4,
dilations (1,2,3)) forward and forward+backward at B=128 bf16 for both
attention implementations:

  * attn_impl="auto"        — the per-shape XLA/Pallas dispatch
  * attn_impl="fused_block" — the whole-block Pallas kernels (the
                              geometry is interpret-parity-tested in
                              tests/test_fused_cores.py::test_fused_interpret_224_geometry)

Run:  python scratch/bench_224.py
"""

import time

import jax
import jax.numpy as jnp

from qavit_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from qavit_tpu.configs import get_preset  # noqa: E402
from qavit_tpu.nn import init_model  # noqa: E402

B = 128


def bench(attn_impl: str):
    preset = get_preset("qavit_224_v1")
    mc = preset.model.replace(attn_impl=attn_impl, dropout=0.0,
                              drop_path=0.0)
    model, variables = init_model(mc, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (B, mc.img_size, mc.img_size, 3), jnp.float32)
    y = (jnp.arange(B) % mc.num_classes).astype(jnp.int32)

    @jax.jit
    def fwd(v, x):
        logits, _ = model.apply(v, x, train=False, bank_count=0)
        return logits

    def loss_fn(params, v, x, y):
        vv = dict(v)
        vv["params"] = params
        logits, _ = model.apply(vv, x, train=True, bank_count=0,
                                rngs={"dropout": jax.random.PRNGKey(2)})
        oh = jax.nn.one_hot(y, mc.num_classes)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))

    grad = jax.jit(jax.grad(loss_fn))

    def sync_tree(t):
        return float(jnp.asarray(jax.tree_util.tree_leaves(t)[0])
                     .astype(jnp.float32).ravel()[0])

    # fwd
    o = fwd(variables, x)
    float(o[0, 0])
    t0 = time.perf_counter()
    it = 20
    for _ in range(it):
        o = fwd(variables, x)
    float(o[0, 0])
    t_fwd = (time.perf_counter() - t0) / it

    # fwd+bwd
    gg = grad(variables["params"], variables, x, y)
    sync_tree(gg)
    t0 = time.perf_counter()
    it = 10
    for _ in range(it):
        gg = grad(variables["params"], variables, x, y)
    sync_tree(gg)
    t_fb = (time.perf_counter() - t0) / it

    print(f"{attn_impl:12s}  fwd {t_fwd * 1e3:7.2f} ms "
          f"({B / t_fwd:8.0f} img/s)   fwd+bwd {t_fb * 1e3:7.2f} ms "
          f"({B / t_fb:8.0f} img/s)")
    return t_fwd, t_fb


if __name__ == "__main__":
    print(f"qavit_224_v1 @B={B} bf16 (n=196, nw=4, dil (1,2,3))")
    for impl in ("auto", "fused_block"):
        bench(impl)
