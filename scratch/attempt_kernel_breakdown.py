"""Per-kernel timing breakdown of the fused block (VERDICT r3 #1).

Times each of the four fused units (swa / msda / cga / cross_tail)
forward and forward+backward at flagship geometry, B=1024 bf16, plus the
whole-block composition — so the 130 ms step decomposes into kernel vs
glue vs non-block time.  Run inside scratch/tpu_repl.py.
"""

import time

import flax.linen as nn
import jax
import jax.numpy as jnp

from qavit_tpu.configs import get_preset
from qavit_tpu.kernels import fused_cores as C
from qavit_tpu.kernels import fused_kernels as K
from qavit_tpu.kernels.fused_block import fused_quad_block
from qavit_tpu.kernels.fused_params import declare_block_params
from qavit_tpu.kernels.fused_ref import make_geom
from qavit_tpu.nn.bank import BankState, GlobalBankParams

cfg = get_preset("hqavit_c100").model
g = make_geom(cfg)
B = 1024
DT = jnp.bfloat16


class Holder(nn.Module):
    @nn.compact
    def __call__(self):
        return declare_block_params(cfg, g)


holder = Holder()
p = holder.apply(holder.init({"params": jax.random.PRNGKey(0)}))

bank_holder = GlobalBankParams(cfg.bank, cfg.embed_dim)
bank_params = bank_holder.apply(bank_holder.init(
    {"params": jax.random.PRNGKey(1)}))
state = BankState(bank_params["global_k"].astype(jnp.float32),
                  bank_params["global_v"].astype(jnp.float32),
                  jnp.int32(0))

x = jax.random.normal(jax.random.PRNGKey(2), (B, g.n, g.c), DT)
rng = jax.random.PRNGKey(3)

tiles, G = K.plan_tiles(B, g)
print("tiles:", tiles, "G:", G)


def sync(v):
    return float(jnp.sum(jax.tree_util.tree_leaves(v)[0]
                         .astype(jnp.float32)))


def timeit(f, *args, iters=20):
    o = f(*args)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    sync(o)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


# ---- whole block ----------------------------------------------------------
def block_fwd(p, x, state):
    y, s2 = fused_quad_block(p, x, state, 0.05, bank_params, cfg.bank, g,
                             DT, True, rng, None)
    return y


def block_loss(p, x, state):
    y, s2 = fused_quad_block(p, x, state, 0.05, bank_params, cfg.bank, g,
                             DT, True, rng, None)
    return jnp.sum(y.astype(jnp.float32))


jf = jax.jit(block_fwd)
jg = jax.jit(jax.grad(block_loss, argnums=(0, 1)))
t_fwd = timeit(jf, p, x, state)
t_fb = timeit(lambda *a: jg(*a)[1], p, x, state)
print(f"block fwd: {t_fwd:.2f} ms   fwd+bwd: {t_fb:.2f} ms")

# ---- per unit -------------------------------------------------------------
prep = C.prep_block(p, g, G)
cores = K.make_cores(g, G, jnp.dtype(DT).name, True)
key = (g, G, jnp.dtype(DT).name, True)

seeds = jax.vmap(lambda i: jax.random.key_data(
    jax.random.fold_in(rng, i)))(jnp.arange(4)).reshape(8)
smem = {"seeds": jax.lax.bitcast_convert_type(seeds, jnp.int32),
        "dpr": jnp.asarray(0.05, jnp.float32).reshape(1)}
const = jax.lax.stop_gradient({"bankp": bank_params})
bank_h = K._bank_heads(state, g)
bank_f = K._bank_full(state)
xn = jax.random.normal(jax.random.PRNGKey(4), (B, g.n, g.c), DT)
outs = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, g.n, g.c), DT)
        for i in range(3)]

from qavit_tpu.kernels.fused_pallas import run_unit  # noqa: E402

UNITS = {
    "swa": (dict(p=prep["swa"], norm1=prep["norm1"], bank=bank_h),
            {"x": x}),
    "msda": (dict(p=prep["msda"], bank=bank_h), {"xn": xn}),
    "cga": (dict(p=prep["cga"], bank=bank_f), {"xn": xn}),
    "cross_tail": (dict(p=prep["cross"], tail=prep["tail"], bank=bank_f),
                   {"x": x, "xn": xn, "swa": outs[0], "msda": outs[1],
                    "cga": outs[2]}),
}

SCAN_N = 20


def scan_time(fn, iters=5):
    """Time fn via a SCAN_N-iteration lax.scan inside ONE dispatch, so
    per-call tunnel latency (~2 ms) cannot pollute per-kernel numbers.
    ``fn(eps)`` must thread the carried scalar into its inputs — a
    loop-carried data dependence — or XLA hoists the body out of the
    while loop and the scan times nothing."""
    def body(carry, _):
        out = fn(carry * 1e-20)
        leaves = [v.astype(jnp.float32).sum()
                  for v in jax.tree_util.tree_leaves(out)]
        return sum(leaves), None

    @jax.jit
    def run():
        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=SCAN_N)
        return s

    float(run())
    t0 = time.perf_counter()
    for _ in range(iters):
        v = run()
    float(v)
    return (time.perf_counter() - t0) / (iters * SCAN_N) * 1e3


rows = []
for name, (diff, batch) in UNITS.items():
    def fwd(diff=diff, batch=batch, name=name):
        bo, ao = run_unit(cores[name], (name, tiles[name]) + key, diff,
                          batch, {}, const, smem=smem, tiles=tiles[name])
        return bo

    def loss(diff, batch, name=name):
        bo, ao = run_unit(cores[name], (name, tiles[name]) + key, diff,
                          batch, {}, const, smem=smem, tiles=tiles[name])
        s = sum(jnp.sum(v.astype(jnp.float32)) for v in bo.values())
        s = s + sum(jnp.sum(v.astype(jnp.float32)) for v in ao.values())
        return s

    grad_fn = jax.grad(loss, argnums=(0, 1))

    def peps(b, eps):
        return {k: v + eps for k, v in b.items()}

    tf = scan_time(lambda e, d=diff, b=batch: fwd(d, peps(b, e)))
    tg = scan_time(lambda e, d=diff, b=batch: grad_fn(d, peps(b, e)))
    rows.append((name, tf, tg))
    print(f"{name:10s} fwd: {tf:6.2f} ms   fwd+bwd: {tg:6.2f} ms  "
          f"(tiles={tiles[name]})", flush=True)

tot_f = sum(r[1] for r in rows)
tot_g = sum(r[2] for r in rows)
print(f"sum of units: fwd {tot_f:.2f} ms  fwd+bwd {tot_g:.2f} ms")


bg = jax.grad(block_loss, argnums=(0, 1))
print(f"block (scan): fwd {scan_time(lambda e: block_fwd(p, x + e, state)):.2f} ms  "
      f"fwd+bwd {scan_time(lambda e: bg(p, x + e, state)):.2f} ms")
