import jax
import jax.numpy as jnp
import numpy as np

from qavit_tpu.configs.model import BANK_V1, BankConfig
from qavit_tpu.nn.bank import (
    GlobalBankParams,
    bank_init_state,
    bank_read,
    bank_write,
)


def _params(rng, cfg=BankConfig(), dim=8):
    holder = GlobalBankParams(cfg, dim)
    v = holder.init(rng)
    return holder.apply(v), v


def test_read_broadcasts(rng):
    p, _ = _params(rng)
    st = bank_init_state(p, 0)
    k, v = bank_read(st, 5, jnp.float32)
    assert k.shape == (5, 16, 8)
    np.testing.assert_array_equal(np.asarray(k[0]), np.asarray(k[4]))


def test_write_eval_noop(rng):
    p, _ = _params(rng)
    st = bank_init_state(p, 0)
    tokens = jax.random.normal(rng, (2, 4, 8))
    st2 = bank_write(p, BankConfig(), st, tokens, train=False)
    assert st2 is st


def test_write_updates_and_clamps(rng):
    cfg = BankConfig()
    p, _ = _params(rng, cfg)
    st = bank_init_state(p, 0)
    tokens = jax.random.normal(rng, (2, 4, 8)) * 100.0
    st2 = bank_write(p, cfg, st, tokens, train=True)
    assert int(st2.count) == 1
    assert not np.allclose(np.asarray(st.k), np.asarray(st2.k))
    assert np.abs(np.asarray(st2.k)).max() <= cfg.value_clamp + 1e-6
    # per-write delta bounded by rate * update_clamp
    delta = np.abs(np.asarray(st2.k - st.k)).max()
    assert delta <= cfg.update_rate_warm * cfg.update_clamp + 1e-6


def test_update_rate_warmup_schedule(rng):
    cfg = BankConfig(warmup_writes=1000)
    p, _ = _params(rng, cfg)
    tokens = jnp.ones((1, 4, 8)) * 10.0
    st_warm = bank_write(p, cfg, bank_init_state(p, 0), tokens, True)
    st_late = bank_write(p, cfg, bank_init_state(p, 5000), tokens, True)
    d_warm = np.abs(np.asarray(st_warm.k - p["global_k"])).max()
    d_late = np.abs(np.asarray(st_late.k - p["global_k"])).max()
    # post-warmup rate is 2x (0.01 vs 0.005) — HQAViT_CIFAR100.py:313
    np.testing.assert_allclose(d_late, 2 * d_warm, rtol=1e-4)


def test_v1_config_no_warmup():
    assert BANK_V1.update_rate_warm == BANK_V1.update_rate == 0.01
    assert BANK_V1.value_clamp == 1.0


def test_gradient_flows_to_bank_params_not_write_path(rng):
    cfg = BankConfig()
    holder = GlobalBankParams(cfg, 8)
    variables = holder.init(rng)
    tokens = jax.random.normal(rng, (2, 4, 8))

    def loss(v):
        p = holder.apply(v)
        st = bank_init_state(p, 0)
        st = bank_write(p, cfg, st, tokens, train=True)
        k, vv = bank_read(st, 2, jnp.float32)
        # a read after the write: gradient must reach global_k/global_v
        return (k ** 2).sum() + (vv ** 2).sum()

    g = jax.grad(loss)(variables)["params"]
    assert float(jnp.abs(g["global_k"]).sum()) > 0
    assert float(jnp.abs(g["global_v"]).sum()) > 0
    # write path is gradient-free (torch updates happen under .data)
    for k in ("write_norm_scale", "write_compression_kernel",
              "write_gate_kernel"):
        assert float(jnp.abs(g[k]).sum()) == 0.0


def test_sequential_write_visibility(rng):
    """A later read must see the earlier write within one forward."""
    cfg = BankConfig()
    p, _ = _params(rng, cfg)
    st0 = bank_init_state(p, 0)
    tokens = jax.random.normal(rng, (2, 4, 8)) * 50
    st1 = bank_write(p, cfg, st0, tokens, True)
    k0, _ = bank_read(st0, 1, jnp.float32)
    k1, _ = bank_read(st1, 1, jnp.float32)
    assert not np.allclose(np.asarray(k0), np.asarray(k1))
