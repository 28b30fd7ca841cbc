"""224-input presets: structural forward + the Pallas flash-attention
kernel exercised at 224-geometry shapes (VERDICT r1 weak #7 — the only
presets whose branch shapes reach the Pallas dispatch thresholds were
never forwarded in CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.configs import get_preset
from qavit_tpu.kernels.attention import use_pallas, xla_attention
from qavit_tpu.kernels.flash_attention import flash_attention


@pytest.mark.parametrize("preset", ["qavit_224_v1", "qavit_v2"])
def test_224_preset_forward(preset):
    """Window-7 grid, dilations (1,2,3), linformer 64, bank v1/v2: the
    full 224 geometry builds and forwards (eval + train w/ bank)."""
    from qavit_tpu.nn import build_model, init_model

    cfg = get_preset(preset).model.replace(dtype="float32")
    model = build_model(cfg)
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    logits, bank = model.apply(variables, x, train=False, bank_count=0)
    assert logits.shape == (2, 100)
    assert np.isfinite(np.asarray(logits)).all()
    out, _ = model.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"], train=True, bank_count=0)
    assert np.isfinite(np.asarray(out[0])).all()


def test_pallas_dispatch_at_224_shapes():
    """The 224 presets' SWA windows (49 tokens over 196-patch grids,
    B*nw rows) and full-grid branches reach the Pallas thresholds on
    TPU; the 32px presets never do (documented crossover,
    docs/PERF_NOTES.md)."""
    # [B, Nq, H, D]: full 196-token grid at 224 — dispatches
    assert use_pallas((64, 196, 4, 48), backend="tpu")
    # 32px presets: window 16 / learned 16 / grid 64 — below threshold
    assert not use_pallas((256, 16, 6, 32), backend="tpu")
    assert not use_pallas((256, 64, 4, 48), backend="tpu")
    # never on CPU
    assert not use_pallas((64, 196, 4, 48), backend="cpu")


def test_flash_kernel_224_shape_parity_interpret():
    """The flash kernel at a 224-geometry shape (interpret mode on CPU)
    matches the XLA reference."""
    b, h, n_q, n_kv, d = 2, 4, 196, 112, 48
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, n_q, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n_kv, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n_kv, h, d), jnp.float32)
    want = xla_attention(q, k, v)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, n_q, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, n_kv, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, n_kv, d)
    got = flash_attention(qf, kf, vf, interpret=True)
    got = got.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
