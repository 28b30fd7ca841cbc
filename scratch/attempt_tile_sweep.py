"""Fused-kernel batch-tile autotune sweep (VERDICT r3 #9).

Times the whole fused block fwd+bwd at B=1024 for a grid of per-kernel
tile-size targets (monkeypatching fused_kernels._TILE_TARGETS), so the
shipped defaults are justified by data.  Run inside scratch/tpu_repl.py.
"""

import itertools
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

from qavit_tpu.configs import get_preset
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


def sync(v):
    return float(jnp.sum(jax.tree_util.tree_leaves(v)[0]
                         .astype(jnp.float32)))


def block_loss(p, x, state):
    y, _ = fused_quad_block(p, x, state, 0.05, bank_params, cfg.bank, g,
                            DT, True, rng, None)
    return jnp.sum(y.astype(jnp.float32))


def time_config(targets, iters=15):
    K._TILE_TARGETS.clear()
    K._TILE_TARGETS.update(targets)
    K._tile_targets.__wrapped__ if hasattr(K._tile_targets, "__wrapped__") \
        else None
    jg = jax.jit(jax.grad(block_loss, argnums=(0, 1)))
    try:
        o = jg(p, x, state)
        sync(o[1])
        t0 = time.perf_counter()
        for _ in range(iters):
            o = jg(p, x, state)
        sync(o[1])
        return (time.perf_counter() - t0) / iters * 1e3
    except Exception as e:  # noqa: BLE001
        return f"FAIL {type(e).__name__}: {str(e)[:80]}"


BASE = {"swa": 64, "msda": 64, "cga": 32, "cross_tail": 64}
print("base", BASE, time_config(dict(BASE)))

# one-factor-at-a-time sweep around the shipped defaults
for unit, cand in [("swa", (32, 128, 256)), ("msda", (32, 128, 256)),
                   ("cga", (16, 64, 128)), ("cross_tail", (32, 128, 256))]:
    for t in cand:
        cfg_t = dict(BASE)
        cfg_t[unit] = t
        print(f"{unit}={t}", time_config(cfg_t))

# joint large-tile configs (fewer grid steps)
for combo in [dict(swa=128, msda=128, cga=64, cross_tail=128),
              dict(swa=256, msda=256, cga=64, cross_tail=256),
              dict(swa=128, msda=128, cga=32, cross_tail=128)]:
    print("joint", combo, time_config(combo))

K._TILE_TARGETS.clear()
K._TILE_TARGETS.update(BASE)
