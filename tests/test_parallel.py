"""Data-parallel tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.nn import build_model, init_model
from qavit_tpu.parallel import (
    DATA_AXIS,
    make_gspmd_train_step,
    make_mesh,
    make_shardmap_train_step,
    shard_batch,
)
from qavit_tpu.train import create_train_state, make_optimizer, make_schedule


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


@pytest.fixture(scope="module")
def dp_setup():
    import jax.random as jr
    from tests.conftest import ModelConfig, TrainingConfig

    cfg = ModelConfig(
        name="dp_tiny", img_size=16, patch_size=4, num_classes=10,
        embed_dim=96, depth=1, num_heads=4, window_size=4,
        dilation_factors=(1, 2), linformer_k=8, msda_pad_len=32,
        hybrid=False, use_token_learner=False, stage_blocks=(1,),
        dtype="float32")
    tc = TrainingConfig(batch_size=16, epochs=1, warmup_epochs=0,
                        use_ema=True, donate=False)
    return cfg, tc


def test_gspmd_dp_step(dp_setup, rng):
    cfg, tc = dp_setup
    mesh = make_mesh()
    model, variables = init_model(cfg, rng)
    sched = make_schedule(tc, 4)
    tx = make_optimizer(tc, 4, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    step = make_gspmd_train_step(model, tx, cfg, tc, mesh, sched)
    x = jax.random.normal(rng, (16, 16, 16, 3))
    y = jnp.tile(jnp.arange(8), 2).astype(jnp.int32)
    x, y = shard_batch(mesh, x, y)
    state2, m = step(state, x, y, rng)
    assert int(m["count"]) == 16
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1


def test_shardmap_dp_step_matches_semantics(dp_setup, rng):
    cfg, tc = dp_setup
    mesh = make_mesh()
    model = build_model(cfg, pmean_axis=DATA_AXIS)
    _, variables = init_model(cfg, rng)
    sched = make_schedule(tc, 4)
    tx = make_optimizer(tc, 4, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    step = make_shardmap_train_step(model, tx, cfg, tc, mesh, sched)
    x = jax.random.normal(rng, (16, 16, 16, 3))
    y = jnp.tile(jnp.arange(8), 2).astype(jnp.int32)
    state2, m = step(state, x, y, rng)
    # psum'd count across 8 devices covers the full global batch
    assert int(m["count"]) == 16
    assert np.isfinite(float(m["loss"]))
    assert int(state2.bank_count) == 3 * cfg.depth
    # replicated params remain identical across devices
    k = state2.params["global_bank"]["global_k"]
    assert len(k.devices()) == 8


def test_dp_eval_step(dp_setup, rng):
    from qavit_tpu.parallel import make_dp_eval_step
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import create_train_state, make_optimizer

    cfg, tc = dp_setup
    mesh = make_mesh()
    model, variables = init_model(cfg, rng)
    tx = make_optimizer(tc, 4)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    step = make_dp_eval_step(model, cfg, mesh)
    x = jax.random.normal(rng, (16, 16, 16, 3))
    y = jnp.tile(jnp.arange(8), 2).astype(jnp.int32)
    x, y = shard_batch(mesh, x, y)
    m = step(state, x, y)
    assert int(m["count"]) == 16
    assert 0 <= int(m["top1"]) <= int(m["top5"]) <= 16
