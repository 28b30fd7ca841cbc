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


def test_gspmd_and_shardmap_dp_are_equivalent(dp_setup, rng):
    """The two DP implementations must produce the same trained state on
    the same data (VERDICT r1 #5).  Mixing/dropout off so both paths are
    deterministic; GSPMD's global batch-mean must equal shard_map's pmean
    of per-shard means (equal shard sizes)."""
    cfg, tc = dp_setup
    cfg = cfg.replace(dropout=0.0, drop_path=0.0)
    tc = tc.replace(use_mixup=False, use_cutmix=False)
    mesh = make_mesh()
    sched = make_schedule(tc, 4)
    tx = make_optimizer(tc, 4, sched)

    model_g, variables = init_model(cfg, jax.random.PRNGKey(3))
    model_s = build_model(cfg, pmean_axis=DATA_AXIS)

    def fresh_state():
        return create_train_state(variables["params"], tx,
                                  variables.get("batch_stats"),
                                  use_ema=True)

    step_g = make_gspmd_train_step(model_g, tx, cfg, tc, mesh, sched)
    step_s = make_shardmap_train_step(model_s, tx, cfg, tc, mesh, sched)

    xs = jax.random.normal(rng, (3, 16, 16, 16, 3))
    ys = jnp.tile(jnp.arange(8), (3, 2)).astype(jnp.int32)

    sg, ss = fresh_state(), fresh_state()
    for k in range(3):
        x, y = shard_batch(mesh, xs[k], ys[k])
        sg, mg = step_g(sg, x, y, rng)
        ss, ms = step_s(ss, xs[k], ys[k], rng)
        np.testing.assert_allclose(float(mg["loss"]), float(ms["loss"]),
                                   rtol=1e-5)

    pg = jax.flatten_util.ravel_pytree(sg.params)[0]
    ps = jax.flatten_util.ravel_pytree(ss.params)[0]
    np.testing.assert_allclose(np.asarray(pg), np.asarray(ps),
                               rtol=2e-5, atol=1e-6)
    assert int(sg.bank_count) == int(ss.bank_count)
    eg = jax.flatten_util.ravel_pytree(sg.ema_params)[0]
    es = jax.flatten_util.ravel_pytree(ss.ema_params)[0]
    np.testing.assert_allclose(np.asarray(eg), np.asarray(es),
                               rtol=2e-5, atol=1e-6)


def test_gspmd_fused_chunk_on_mesh(dp_setup, rng):
    """steps-per-call > 1 must work under a mesh: the fused aug+K-step
    chunk runs sharded (lifts the r1 single-chip restriction)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qavit_tpu.data.augment import AugConfig
    from qavit_tpu.parallel import make_gspmd_train_chunk

    cfg, tc = dp_setup
    mesh = make_mesh()
    model, variables = init_model(cfg, rng)
    sched = make_schedule(tc, 4)
    tx = make_optimizer(tc, 4, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    aug = AugConfig(mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
                    crop_pad=2)
    chunk = make_gspmd_train_chunk(model, tx, cfg, tc, aug, mesh,
                                   num_steps=2, schedule=sched)
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, 16, 16, 16, 3)).astype(np.uint8)
    tgts = jnp.tile(jnp.arange(8), (2, 2)).astype(jnp.int32)
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    state2, m = chunk(state, jax.device_put(imgs, sh),
                      jax.device_put(tgts, sh), rng)
    assert int(state2.step) == 2
    assert m["loss"].shape == (2,)
    assert np.isfinite(np.asarray(m["loss"])).all()


def test_multihost_loader_slicing():
    """Each (simulated) process takes a disjoint contiguous share of the
    same global permutation; shares reassemble the global batch."""
    from qavit_tpu.data.loader import process_local_indices

    batch = np.arange(32)
    shares = [process_local_indices(batch, 4, p) for p in range(4)]
    assert all(len(s) == 8 for s in shares)
    np.testing.assert_array_equal(np.concatenate(shares), batch)


def test_loader_sharded_placement(dp_setup):
    """Loader with a mesh sharding yields batch-sharded device arrays."""
    from qavit_tpu.data.loader import BatchLoader
    from qavit_tpu.parallel import batch_sharding

    mesh = make_mesh()
    imgs = np.zeros((32, 16, 16, 3), np.uint8)
    labels = np.arange(32, dtype=np.int64)
    loader = BatchLoader(imgs, labels, 16, shuffle=False,
                         sharding=batch_sharding(mesh))
    x, y = next(iter(loader))
    assert x.shape == (16, 16, 16, 3)
    assert len(x.sharding.device_set) == 8
    # each device holds a [2, ...] shard of the batch
    assert x.addressable_shards[0].data.shape[0] == 2


def test_shardmap_step_with_fused_block(dp_setup, rng):
    """The fused-block Pallas path under explicit shard_map DP on the
    virtual mesh: per-shard kernels (interpret mode on CPU) + psum'd
    grads + pmean'd bank update execute and produce finite metrics.
    GSPMD cannot auto-partition pallas_call custom calls — shard_map is
    the supported multi-chip combination for ``attn_impl=fused_block``."""
    import qavit_tpu.kernels.fused_block as FB

    cfg, tc = dp_setup
    cfg = cfg.replace(name="dp_fused", attn_impl="fused_block",
                      dropout=0.0, drop_path=0.0)
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
    FB.FORCE_PALLAS_INTERPRET = True
    try:
        state2, m = step(state, x, y, rng)
    finally:
        FB.FORCE_PALLAS_INTERPRET = False
    assert int(m["count"]) == 16
    assert np.isfinite(float(m["loss"]))
    assert int(state2.bank_count) == 3 * cfg.depth


def test_gspmd_grad_accum_equivalent_on_mesh(dp_setup, rng):
    """tc.gradient_accumulation_steps composes with the GSPMD mesh step
    (VERDICT r2 #10): accum=2 equals accum=1 on the same global batch
    (mixing off so the comparison is deterministic)."""
    cfg, tc = dp_setup
    cfg = cfg.replace(dropout=0.0, drop_path=0.0)
    tc = tc.replace(use_mixup=False, use_cutmix=False)
    mesh = make_mesh()
    model, variables = init_model(cfg, rng)
    sched = make_schedule(tc, 4)
    tx = make_optimizer(tc, 4, sched)

    def run(accum):
        tca = tc.replace(gradient_accumulation_steps=accum)
        state = create_train_state(variables["params"], tx,
                                   variables.get("batch_stats"),
                                   use_ema=True)
        step = make_gspmd_train_step(model, tx, cfg, tca, mesh, sched)
        x = jax.random.normal(jax.random.PRNGKey(7), (16, 16, 16, 3))
        y = jnp.tile(jnp.arange(8), 2).astype(jnp.int32)
        x, y = shard_batch(mesh, x, y)
        state2, m = step(state, x, y, rng)
        _, m2 = step(state2, x, y, rng)          # second step: the
        return state2, m, m2                     # trained params' loss

    s1, m1, m1b = run(1)
    s2, m2, m2b = run(2)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # AdamW's step-1 update is ~lr*sign(g): f32 micro-batch summation
    # noise flips signs where g~0, so assert sign agreement + the
    # second-step loss (functional equivalence) rather than elementwise
    # closeness (same rationale as dryrun_multichip)
    from jax.flatten_util import ravel_pytree
    p0 = np.asarray(ravel_pytree(variables["params"])[0])
    d1 = np.asarray(ravel_pytree(s1.params)[0]) - p0
    d2 = np.asarray(ravel_pytree(s2.params)[0]) - p0
    assert float(np.mean(np.sign(d1) == np.sign(d2))) > 0.95
    np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]),
                               rtol=1e-3)


def test_gspmd_debug_grads_on_mesh(dp_setup, rng):
    """--debug-grads' per-leaf gradient metrics compose with the GSPMD
    mesh step (VERDICT r2 #10)."""
    cfg, tc = dp_setup
    mesh = make_mesh()
    model, variables = init_model(cfg, rng)
    sched = make_schedule(tc, 4)
    tx = make_optimizer(tc, 4, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    step = make_gspmd_train_step(model, tx, cfg, tc, mesh, sched,
                                 debug_grads=True)
    x = jax.random.normal(rng, (16, 16, 16, 3))
    y = jnp.tile(jnp.arange(8), 2).astype(jnp.int32)
    x, y = shard_batch(mesh, x, y)
    _, m = step(state, x, y, rng)
    per_leaf = m["per_leaf"]
    assert len(per_leaf) > 5
    for norm in per_leaf.values():
        assert np.isfinite(float(norm))
