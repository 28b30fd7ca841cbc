import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.configs import TrainingConfig
from qavit_tpu.nn import init_model
from qavit_tpu.train import (
    apply_mix,
    create_train_state,
    ema_distance,
    ema_warmup_decay,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_step,
    swap_bank,
)
from qavit_tpu.train.optim import lr_group_multipliers, per_tensor_clip


def test_onecycle_schedule_endpoints():
    tc = TrainingConfig(epochs=10, warmup_epochs=2, base_lr=1e-3,
                        schedule="onecycle")
    s = make_schedule(tc, steps_per_epoch=10)
    assert float(s(0)) == pytest.approx(1e-3 / 25, rel=1e-3)
    assert float(s(20)) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(100)) == pytest.approx(1e-3 / 25 / 1e4, rel=0.05)


def test_warm_restart_schedule_restarts():
    tc = TrainingConfig(epochs=10, warmup_epochs=0, base_lr=1e-3,
                        min_lr=1e-5, schedule="warm_restarts",
                        warm_restart_t0_epochs=2, warm_restart_t_mult=2)
    s = make_schedule(tc, steps_per_epoch=10)
    # cycle boundaries at steps 20 (t0) and 60 (t0 + 2*t0)
    assert float(s(0)) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(19)) < 2e-4  # near the valley
    assert float(s(20)) == pytest.approx(1e-3, rel=1e-2)  # restart
    assert float(s(60)) == pytest.approx(1e-3, rel=1e-2)  # second restart


def test_per_tensor_clip_only_matching_keys():
    clip = per_tensor_clip(0.1, ("dwconv",))
    grads = {"dwconv_w": jnp.ones((4,)) * 10.0, "other": jnp.ones((4,)) * 10}
    out, _ = clip.update(grads, clip.init(grads))
    assert float(jnp.linalg.norm(out["dwconv_w"])) == pytest.approx(0.1,
                                                                    rel=1e-3)
    np.testing.assert_array_equal(np.asarray(out["other"]),
                                  np.asarray(grads["other"]))


def test_lr_group_multipliers_layerwise():
    tc = TrainingConfig(lr_groups="layerwise", head_lr_multiplier=5.0,
                        layer_lr_decay=0.8)
    m = lr_group_multipliers(tc)
    assert m("head/kernel") == 5.0
    assert m("stage4_blocks/x") == 1.0
    assert m("stage1_blocks/x") == pytest.approx(0.8 ** 3)
    assert m("fuse2/gate_fc/kernel") == 0.5
    assert m("cnn_stem/stem_conv/kernel") == 0.1
    assert m("pos_embed") == 0.3
    assert m("norm/scale") == 1.0


def test_ema_warmup_decay():
    assert ema_warmup_decay(1, 20, 0.99, 0.999) == pytest.approx(
        0.99 + (0.999 - 0.99) / 20)
    assert ema_warmup_decay(25, 20, 0.99, 0.999) == 0.999


def test_mix_identity_when_disabled(rng):
    tc = TrainingConfig(use_mixup=False, use_cutmix=False)
    x = jax.random.normal(rng, (4, 8, 8, 3))
    y = jnp.arange(4)
    b = apply_mix(rng, x, y, tc)
    np.testing.assert_array_equal(np.asarray(b.images), np.asarray(x))
    assert float(b.lam) == 1.0


def test_mix_cutmix_lam_matches_box(rng):
    tc = TrainingConfig(use_mixup=False, use_cutmix=True, mix_prob=1.0)
    x = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))])
    y = jnp.array([0, 1])
    b = apply_mix(rng, x, y, tc)
    # pixel ratio must equal the adjusted lambda exactly
    frac_mixed = float((np.asarray(b.images[0]) != 0).mean())
    assert float(b.lam) == pytest.approx(1.0 - frac_mixed, abs=1e-6) or \
        float(b.lam) == 1.0  # degenerate zero-area box


def test_train_step_runs_and_updates(tiny_cfg, tiny_bundle, tiny_train_cfg, rng):
    model, variables = tiny_bundle
    tc = tiny_train_cfg
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    step = make_train_step(model, tx, tiny_cfg, tc, sched)
    x = jax.random.normal(rng, (4, 16, 16, 3))
    y = jnp.array([0, 1, 2, 3])
    state2, m = step(state, x, y, rng)
    assert int(state2.step) == 1
    assert int(state2.bank_count) == 3 * tiny_cfg.depth
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0
    # params changed
    d0 = jax.flatten_util.ravel_pytree(state.params)[0]
    d1 = jax.flatten_util.ravel_pytree(state2.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # EMA moved toward params but is distinct
    pd, _ = ema_distance(state2.ema_params, state2.params)
    assert float(pd) > 0
    # second step continues the bank counter
    state3, _ = step(state2, x, y, rng)
    assert int(state3.bank_count) == 6 * tiny_cfg.depth


def test_eval_step_counts(tiny_cfg, tiny_bundle, tiny_train_cfg, rng):
    model, variables = tiny_bundle
    tc = tiny_train_cfg
    tx = make_optimizer(tc, 10)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    ev = make_eval_step(model, tiny_cfg)
    x = jax.random.normal(rng, (8, 16, 16, 3))
    y = jnp.zeros((8,), jnp.int32)
    m = ev(state, x, y)
    assert int(m["count"]) == 8
    assert 0 <= int(m["top1"]) <= int(m["top5"]) <= 8
    # ema eval path
    ev_ema = make_eval_step(model, tiny_cfg, use_ema=True)
    m2 = ev_ema(state, x, y)
    # fresh EMA equals params -> identical metrics
    assert int(m2["top1"]) == int(m["top1"])


def test_swap_bank(tiny_cfg, tiny_bundle, rng):
    model, variables = tiny_bundle
    params = variables["params"]
    from qavit_tpu.nn.bank import BankState
    new = BankState(jnp.ones_like(params["global_bank"]["global_k"]),
                    jnp.ones_like(params["global_bank"]["global_v"]),
                    jnp.int32(7))
    swapped = swap_bank(params, new)
    np.testing.assert_array_equal(
        np.asarray(swapped["global_bank"]["global_k"]), 1.0)
    # other params untouched
    assert swapped["head"] is params["head"]


@pytest.mark.parametrize("flat", [False, True])
def test_scanned_train_step(tiny_cfg, tiny_bundle, tiny_train_cfg, rng,
                            flat):
    # flat=True pins the --steps-per-call + --flat-optimizer CLI
    # composition (the scanned body wraps make_train_step, so the flat
    # transform must thread through the scan carry)
    from qavit_tpu.train.steps import make_scanned_train_step

    model, variables = tiny_bundle
    tc = tiny_train_cfg.replace(flat_optimizer=flat)
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    k, b = 3, 4
    step = make_scanned_train_step(model, tx, tiny_cfg, tc, sched,
                                   num_steps=k)
    x = jax.random.normal(rng, (k, b, 16, 16, 3))
    y = jnp.zeros((k, b), jnp.int32)
    state2, metrics = step(state, x, y, rng)
    assert int(state2.step) == k
    assert int(state2.bank_count) == k * 3 * tiny_cfg.depth
    assert metrics["loss"].shape == (k,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_fused_train_chunk(tiny_cfg, tiny_bundle, tiny_train_cfg, rng):
    from qavit_tpu.data import AugConfig
    from qavit_tpu.train.steps import make_fused_train_chunk

    model, variables = tiny_bundle
    tc = tiny_train_cfg
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    aug = AugConfig(mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
                    crop_pad=2, randaug_ops=1, randaug_magnitude=5,
                    erasing_prob=0.2)
    k, b = 2, 4
    chunk = make_fused_train_chunk(model, tx, tiny_cfg, tc, aug,
                                   num_steps=k)
    imgs = jnp.zeros((k, b, 16, 16, 3), jnp.uint8)
    tgts = jnp.zeros((k, b), jnp.int32)
    state2, metrics = chunk(state, imgs, tgts, rng)
    assert int(state2.step) == k
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_mix_extreme_single_draw(rng):
    """EXTREME style: one uniform draw routed by probability bands
    (QAViTV2_EXTREME.py:1279-1321)."""
    tc = TrainingConfig(use_mixup=True, use_cutmix=True, mix_style="extreme",
                        mixup_alpha=0.2, cutmix_alpha=1.0,
                        mixup_prob=0.8, cutmix_prob=0.2)
    x = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
    y = jnp.array([0, 1])
    mixed = 0
    for i in range(20):
        b = apply_mix(jax.random.PRNGKey(i), x, y, tc)
        assert 0.0 <= float(b.lam) <= 1.0
        if float(b.lam) < 1.0 or not np.allclose(np.asarray(b.images),
                                                 np.asarray(x)):
            mixed += 1
    # mixup_prob + cutmix_prob = 1.0 -> virtually every draw mixes
    assert mixed >= 15


def test_gradient_accumulation_step(tiny_cfg, tiny_bundle, tiny_train_cfg,
                                    rng):
    """k=2 accumulation must advance bank/BN per micro-batch, step the
    optimizer once, and keep metrics sane (HQAViT_CIFAR100.py:1405-1440)."""
    model, variables = tiny_bundle
    tc = tiny_train_cfg.replace(gradient_accumulation_steps=2,
                                use_mixup=False, use_cutmix=False)
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    step = make_train_step(model, tx, tiny_cfg, tc, sched)
    x = jax.random.normal(rng, (4, 16, 16, 3))
    y = jnp.array([0, 1, 2, 3])
    state2, m = step(state, x, y, rng)
    assert int(state2.step) == 1                     # ONE optimizer step
    # bank wrote once per micro-forward: 2 micro-batches
    assert int(state2.bank_count) == 2 * 3 * tiny_cfg.depth
    assert np.isfinite(float(m["loss"]))
    assert int(m["correct"]) <= 4 and int(m["count"]) == 4
    d0 = jax.flatten_util.ravel_pytree(state.params)[0]
    d1 = jax.flatten_util.ravel_pytree(state2.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_gradient_accumulation_matches_full_batch(tiny_plain_cfg, rng):
    """With dropout/mixing off, no BN (plain model) and bank writes
    neutralised (rate 0 — otherwise micro-batch 2 reads micro-batch 1's
    write, unlike the single full batch), mean-of-micro-grads ==
    grad-of-full-batch, so k=2 must reproduce the k=1 update exactly."""
    from qavit_tpu.configs.model import BankConfig

    tc = TrainingConfig(batch_size=4, use_ema=False, use_mixup=False,
                        use_cutmix=False, label_smoothing=0.0,
                        subtree_clip_norm=None, donate=False)
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)

    cfg = tiny_plain_cfg.replace(
        dropout=0.0, drop_path=0.0,
        bank=BankConfig(update_rate_warm=0.0, update_rate=0.0))
    model2, variables2 = init_model(cfg, jax.random.PRNGKey(0))

    x = jax.random.normal(rng, (4, 16, 16, 3))
    y = jnp.array([0, 1, 2, 3])

    def run(k):
        tck = tc.replace(gradient_accumulation_steps=k)
        st = create_train_state(variables2["params"], tx, None,
                                use_ema=False)
        step = make_train_step(model2, tx, cfg, tck, sched)
        st2, m = step(st, x, y, rng)
        return st2, m

    s1, m1 = run(1)
    s2, m2 = run(2)
    # identical micro-data => equal accumulated grads; bank writes are
    # stop-gradient so the only difference is the batch-mean granularity
    # of the bank VALUE, which does not feed this step's gradients.
    p1 = jax.flatten_util.ravel_pytree(
        {k: v for k, v in s1.params.items() if k != "global_bank"})[0]
    p2 = jax.flatten_util.ravel_pytree(
        {k: v for k, v in s2.params.items() if k != "global_bank"})[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=2e-4, atol=2e-6)


def test_gradient_free_params_not_decayed(tiny_cfg, tiny_bundle, rng):
    """Branch write-path LNs and bank write projections get NO gradient in
    torch (outputs feed only .data ops, QAViT.py:362 / :183-224) so AdamW
    never updates them; with zero grads our decoupled weight decay must
    leave them untouched too."""
    from qavit_tpu.train import make_train_step

    model, variables = tiny_bundle
    tc = TrainingConfig(batch_size=4, use_ema=False, donate=False)
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)
    state = create_train_state(variables["params"], tx, 
                               variables.get("batch_stats"), use_ema=False)
    step = make_train_step(model, tx, tiny_cfg, tc, sched)
    x = jax.random.normal(rng, (4, 16, 16, 3))
    y = jnp.array([0, 1, 2, 3])
    state2, _ = step(state, x, y, rng)

    def blk(params, stage):
        return params[stage]["quad_block"]

    for stage in ("stage1_blocks", "stage2_blocks"):
        for br in ("swa", "msda", "cga"):
            before = blk(state.params, stage)[br]["norm"]
            after = blk(state2.params, stage)[br]["norm"]
            np.testing.assert_array_equal(np.asarray(before["scale"]),
                                          np.asarray(after["scale"]))
        bank_b = state.params["global_bank"]["write_norm_scale"]
        bank_a = state2.params["global_bank"]["write_norm_scale"]
        np.testing.assert_array_equal(np.asarray(bank_b),
                                      np.asarray(bank_a))
        # but norm_swa (post-branch, DOES get grads) moved
        ns_b = blk(state.params, stage)["norm_swa"]["scale"]
        ns_a = blk(state2.params, stage)["norm_swa"]["scale"]
        assert not np.array_equal(np.asarray(ns_b), np.asarray(ns_a))


def test_resident_chunk_matches_fused_chunk(tiny_cfg, tiny_bundle,
                                            tiny_train_cfg, rng):
    """Device-resident chunk (dataset in HBM, dispatch ships indices)
    computes EXACTLY the host-fed fused chunk on the same gathered data."""
    from qavit_tpu.data import AugConfig
    from qavit_tpu.train.steps import (make_fused_train_chunk,
                                       make_resident_train_chunk)

    model, variables = tiny_bundle
    tc = tiny_train_cfg
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)

    def fresh():
        return create_train_state(variables["params"], tx,
                                  variables.get("batch_stats"),
                                  use_ema=True)

    aug = AugConfig(mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
                    crop_pad=2, randaug_ops=1, randaug_magnitude=5,
                    erasing_prob=0.2)
    k, b, n = 2, 4, 32
    data = jax.random.randint(jax.random.PRNGKey(9), (n, 16, 16, 3),
                              0, 256, jnp.uint8)
    labels = (jnp.arange(n) % 10).astype(jnp.int32)
    idx = jax.random.permutation(jax.random.PRNGKey(10), n)[: k * b]
    idx = idx.reshape(k, b).astype(jnp.int32)

    chunk_h = make_fused_train_chunk(model, tx, tiny_cfg, tc, aug,
                                     num_steps=k)
    chunk_r = make_resident_train_chunk(model, tx, tiny_cfg, tc, aug,
                                        num_steps=k)
    sh, mh = chunk_h(fresh(), jnp.take(data, idx.reshape(-1), 0)
                     .reshape(k, b, 16, 16, 3),
                     jnp.take(labels, idx.reshape(-1), 0).reshape(k, b),
                     rng)
    sr, mr = chunk_r(fresh(), data, labels, idx, rng)
    np.testing.assert_allclose(np.asarray(mr["loss"]),
                               np.asarray(mh["loss"]), rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(sr.params),
                    jax.tree_util.tree_leaves(sh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)


def test_index_loader_covers_epoch():
    from qavit_tpu.data import IndexLoader

    il = IndexLoader(103, 10, shuffle=True, seed=0)
    assert len(il) == 10
    seen = np.concatenate(list(il))
    assert len(seen) == 100
    assert len(np.unique(seen)) == 100      # no repeats within an epoch
    seen2 = np.concatenate(list(il))
    assert not np.array_equal(seen, seen2)  # reshuffled next epoch
