import json
import jax.flatten_util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.ckpt import restore_train_state, save_train_state
from qavit_tpu.interpret import attention_rollout, grad_cam
from qavit_tpu.obs import (
    TrainingLogger,
    analytic_flops,
    grad_stats,
    param_breakdown,
)
from qavit_tpu.train import create_train_state, make_optimizer


def test_grad_cam_shape_and_range(tiny_cfg, tiny_bundle, rng):
    model, variables = tiny_bundle
    img = jax.random.normal(rng, (16, 16, 3))
    cam, cls = grad_cam(model, variables, img)
    assert cam.shape == (16, 16)
    assert 0 <= cls < tiny_cfg.num_classes
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    assert np.isfinite(cam).all()


def test_attention_rollout(tiny_cfg, tiny_bundle, rng):
    model, variables = tiny_bundle
    img = jax.random.normal(rng, (16, 16, 3))
    sal = attention_rollout(model, variables, img)
    assert sal.shape == (16, 16)
    assert 0.9 <= sal.max() <= 1.0 + 1e-5


def test_attention_rollout_pure_qavit(tiny_plain_cfg, rng):
    """Pure-QAViT rollout: SWA attention back-mapped through |E_k|
    (VERDICT r3 weak #7 — interpret/rollout.py raised for non-hybrids)."""
    from qavit_tpu.nn import init_model

    model, variables = init_model(tiny_plain_cfg, jax.random.PRNGKey(0))
    img = jax.random.normal(rng, (16, 16, 3))
    sal = attention_rollout(model, variables, img)
    assert sal.shape == (16, 16)
    assert 0.9 <= sal.max() <= 1.0 + 1e-5
    assert np.isfinite(sal).all()
    # the map must not be uniform — windows mix positions unevenly
    assert sal.std() > 1e-5


def test_attention_rollout_hybrid_no_learner_raises(tiny_cfg):
    from qavit_tpu.nn import init_model

    cfg = tiny_cfg.replace(use_token_learner=False)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    img = np.zeros((16, 16, 3), np.float32)
    with pytest.raises(ValueError):
        attention_rollout(model, variables, img)


def test_checkpoint_roundtrip(tiny_cfg, tiny_bundle, tiny_train_cfg,
                              tmp_path, rng):
    model, variables = tiny_bundle
    tx = make_optimizer(tiny_train_cfg, 10)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    state = state.replace(step=jnp.int32(7), bank_count=jnp.int32(42))
    save_train_state(tmp_path / "ckpt", state, tiny_cfg, tiny_train_cfg,
                     {"val_acc": 12.3})
    template = create_train_state(variables["params"], tx,
                                  variables.get("batch_stats"), use_ema=True)
    restored, meta = restore_train_state(tmp_path / "ckpt", template)
    assert int(restored.step) == 7
    assert int(restored.bank_count) == 42
    assert meta["metrics"]["val_acc"] == 12.3
    assert meta["model_config"]["embed_dim"] == tiny_cfg.embed_dim
    a = jax.flatten_util.ravel_pytree(state.params)[0]
    b = jax.flatten_util.ravel_pytree(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_for_transfer_drops_head_and_resizes(tiny_cfg, tiny_bundle,
                                                  tmp_path, rng):
    from qavit_tpu.ckpt import load_for_transfer
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import make_optimizer as mo

    model, variables = tiny_bundle
    from qavit_tpu.configs import TrainingConfig
    tx = mo(TrainingConfig(donate=False), 10)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=False)
    save_train_state(tmp_path / "pre", state)

    # new model: 2x resolution, different head
    cfg2 = tiny_cfg.replace(img_size=32, num_classes=7)
    _, v2 = init_model(cfg2, jax.random.PRNGKey(1))
    merged = load_for_transfer(tmp_path / "pre", v2["params"],
                               drop_head=True)
    # head keeps the new init (different class count)
    assert merged["head"]["kernel"].shape[-1] == 7
    # pos_embed resized 16 -> 64 tokens
    assert merged["pos_embed"].shape == v2["params"]["pos_embed"].shape
    # backbone weights transferred
    np.testing.assert_array_equal(
        np.asarray(merged["global_bank"]["global_k"]),
        np.asarray(state.params["global_bank"]["global_k"]))


def test_load_for_transfer_auto_keeps_same_task_head(tiny_cfg, tiny_bundle,
                                                     tmp_path, rng):
    """drop_head='auto': a same-task finetune keeps the trained head and
    the BN running stats, matching the reference's full-state-dict load
    (HQAViT_C100_Finetune.py:404-408)."""
    from qavit_tpu.ckpt import load_for_transfer
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import make_optimizer as mo
    from qavit_tpu.configs import TrainingConfig

    model, variables = tiny_bundle
    tx = mo(TrainingConfig(donate=False), 10)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=False)
    save_train_state(tmp_path / "pre", state)

    # same config, different init seed: shapes all match
    _, v2 = init_model(tiny_cfg, jax.random.PRNGKey(7))
    merged, bstats = load_for_transfer(
        tmp_path / "pre", v2["params"], drop_head="auto",
        template_batch_stats=v2.get("batch_stats") or {})
    # head transferred (same class count)
    np.testing.assert_array_equal(
        np.asarray(merged["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]))
    if state.batch_stats:
        chk = jax.tree_util.tree_leaves(state.batch_stats)
        got = jax.tree_util.tree_leaves(bstats)
        for c, g in zip(chk, got):
            np.testing.assert_array_equal(np.asarray(c), np.asarray(g))

    # different class count -> auto drops the head
    cfg3 = tiny_cfg.replace(num_classes=7)
    _, v3 = init_model(cfg3, jax.random.PRNGKey(2))
    merged3 = load_for_transfer(tmp_path / "pre", v3["params"],
                                drop_head="auto")
    assert merged3["head"]["kernel"].shape[-1] == 7


def test_retain_checkpoint_roundtrip(tiny_cfg, tiny_bundle, tmp_path, rng):
    """retain_checkpoint drops opt_state/step but the slim copy still
    feeds load_for_transfer (incl. EMA weights) and restore_train_state
    (template fallback for the dropped leaves)."""
    from qavit_tpu.ckpt import (load_for_transfer, restore_train_state,
                                retain_checkpoint)
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import make_optimizer as mo
    from qavit_tpu.configs import TrainingConfig

    model, variables = tiny_bundle
    tx = mo(TrainingConfig(donate=False), 10)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    save_train_state(tmp_path / "full", state,
                     metrics={"epoch": 3, "val_acc": 88.5})
    retain_checkpoint(tmp_path / "full", tmp_path / "slim")

    meta = json.loads((tmp_path / "slim" / "meta.json").read_text())
    assert "opt_state" not in meta["state_keys"]
    assert meta["metrics"]["val_acc"] == 88.5

    # transfer load: EMA weights selected when asked
    _, v2 = init_model(tiny_cfg, jax.random.PRNGKey(9))
    merged = load_for_transfer(tmp_path / "slim", v2["params"],
                               drop_head="auto", use_ema=True)
    np.testing.assert_array_equal(
        np.asarray(merged["global_bank"]["global_k"]),
        np.asarray(state.ema_params["global_bank"]["global_k"]))

    # eval-path load: restore into a fresh template
    restored, _ = restore_train_state(tmp_path / "slim", state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]))


def test_training_logger_schema(tmp_path):
    log = TrainingLogger(tmp_path)
    log.log_epoch(1, {"train_loss": 1.0, "train_acc": 10.0,
                      "val_loss": 1.1, "val_acc": 12.0, "lr": 1e-3,
                      "grad_norm": 0.5, "epoch_time": 3.2})
    out = log.save()
    d = json.loads(out.read_text())
    assert set(d) == {"history", "best_val_acc", "total_time"}
    assert list(d["history"]["epoch"]) == [1]
    assert d["best_val_acc"] == 12.0
    # plot smoke
    assert log.plot() is not None


def test_grad_stats_and_flops(tiny_cfg, tiny_bundle):
    model, variables = tiny_bundle
    grads = jax.tree.map(jnp.ones_like, variables["params"])
    s = grad_stats(grads)
    assert float(s["global_norm"]) > 0
    assert not bool(s["has_nan"])
    pb = param_breakdown(variables["params"])
    assert sum(pb.values()) == sum(
        x.size for x in jax.tree.leaves(variables["params"]))
    fl = analytic_flops(tiny_cfg)
    assert fl["total"] > 0
    from qavit_tpu.obs.analyzer import memory_breakdown
    mem = memory_breakdown(tiny_cfg, variables["params"], batch=8)
    # remat keeps one block's activations live; no-remat holds depth x
    assert mem["all blocks (no remat)"][0] == \
        mem["per block"][0] * tiny_cfg.depth
    assert mem["all blocks (remat, live)"][0] == mem["per block"][0]
    assert all(a >= 0 and g >= 0 for a, g in mem.values())


def test_log_parse_roundtrip(tmp_path, capsys):
    from qavit_tpu.obs import TrainingLogger
    from qavit_tpu.obs.log_parse import parse_training_log, plot_history

    log = TrainingLogger(tmp_path)
    for epoch in (1, 2):
        log.print_epoch_summary(epoch, {
            "train_loss": 4.0 / epoch, "train_acc": 10.0 * epoch,
            "val_loss": 4.1 / epoch, "val_acc": 9.0 * epoch,
            "lr": 1e-3, "grad_norm": 0.5, "epoch_time": 100.0})
    text = capsys.readouterr().out
    logfile = tmp_path / "train.log"
    logfile.write_text(text)
    hist = parse_training_log(str(logfile))
    assert hist["epoch"] == [1, 2]
    assert hist["train_acc"] == [10.0, 20.0]
    assert hist["val_acc"] == [9.0, 18.0]
    out = plot_history(hist, str(tmp_path / "plot.png"))
    assert out is not None


def test_gaussian_blur_preserves_mass(rng):
    from qavit_tpu.data.augment import gaussian_blur
    img = jnp.zeros((9, 9, 3)).at[4, 4].set(255.0)
    out = gaussian_blur(rng, img, 3)
    assert abs(float(out.sum()) - 765.0) < 1.0
    assert float(out[4, 4, 0]) < 255.0


def test_restore_ema_checkpoint_into_no_ema_template(tiny_cfg, tiny_bundle,
                                                     tiny_train_cfg,
                                                     tmp_path):
    """A with-EMA checkpoint must load into a no-EMA template (the eval
    CLI path) and vice versa."""
    model, variables = tiny_bundle
    tx = make_optimizer(tiny_train_cfg, 10)
    state_ema = create_train_state(variables["params"], tx,
                                   variables.get("batch_stats"),
                                   use_ema=True)
    save_train_state(tmp_path / "ck", state_ema)
    template = create_train_state(variables["params"], tx,
                                  variables.get("batch_stats"),
                                  use_ema=False)
    restored, _ = restore_train_state(tmp_path / "ck", template)
    assert restored.ema_params is None
    # and the reverse: no-EMA checkpoint into with-EMA template
    state_plain = create_train_state(variables["params"], tx,
                                     variables.get("batch_stats"),
                                     use_ema=False)
    save_train_state(tmp_path / "ck2", state_plain)
    template2 = create_train_state(variables["params"], tx,
                                   variables.get("batch_stats"),
                                   use_ema=True)
    restored2, _ = restore_train_state(tmp_path / "ck2", template2)
    assert restored2.ema_params is not None


def test_grad_cam_bf16_model(tiny_cfg, rng):
    """The perturbation hook must not change the bf16 scan-carry dtype."""
    from qavit_tpu.nn import init_model

    cfg = tiny_cfg.replace(dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    img = jax.random.normal(rng, (16, 16, 3))
    cam, cls = grad_cam(model, variables, img)
    assert cam.shape == (16, 16)
    assert np.isfinite(cam).all()


def test_gradcam_hook_is_pre_norm(tiny_cfg, tiny_bundle, rng):
    """The perturbation must sit on the pre-LN projection output, exactly
    where the reference hooks model.patch_embed.proj (test_hqa.py:243):
    perturbing it must shift the recomputed hooked activation 1:1."""
    from qavit_tpu.interpret.gradcam import _patch_activation

    model, variables = tiny_bundle
    img = jax.random.normal(rng, (1, 16, 16, 3))
    acts = _patch_activation(tiny_cfg, variables["params"], img)
    # pre-norm activation is NOT normalised: per-token mean/var are free
    stds = np.asarray(acts[0].std(axis=-1))
    assert not np.allclose(stds, 1.0, atol=0.05)

    # a UNIFORM shift at the pre-LN hook must vanish through the LN's
    # mean-subtraction (shift invariance) — only true pre-norm
    uniform = jnp.ones((1,) + acts.shape[1:], jnp.float32)
    base = {k: v for k, v in variables.items() if k != "perturbations"}
    l_uni, _ = model.apply(
        {**base,
         "perturbations": {"patch_embed": {"patch_tokens": uniform}}},
        img, train=False, bank_count=0)

    # a non-uniform perturbation must shift logits through the model
    pert = jax.random.normal(jax.random.fold_in(rng, 7),
                             (1,) + acts.shape[1:], jnp.float32)
    l0, _ = model.apply(base, img, train=False, bank_count=0)
    l1, _ = model.apply(
        {**base, "perturbations": {"patch_embed": {"patch_tokens": pert}}},
        img, train=False, bank_count=0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l_uni), atol=1e-5)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_tta_reference_transform_set():
    """The 5 exact TTA transforms of HQAViT_C100_Finetune.py:106-132."""
    from qavit_tpu.data.augment import AugConfig, normalize
    from qavit_tpu.eval import make_tta_preprocessors

    aug = AugConfig(mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    preps = make_tta_preprocessors(aug, seed=0)
    assert len(preps) == 5

    imgs = np.random.RandomState(0).randint(
        40, 216, (4, 32, 32, 3)).astype(np.uint8)
    ident, flip, crop, flip_crop, bright = [np.asarray(p(jnp.asarray(imgs)))
                                            for p in preps]
    expect = np.asarray(normalize(imgs.astype(np.float32) / 255.0,
                                  aug.mean, aug.std))
    # 1: identity = plain normalise; 2: deterministic h-flip
    np.testing.assert_allclose(ident, expect, atol=1e-5)
    np.testing.assert_allclose(flip, expect[:, :, ::-1], atol=1e-5)
    # 3/4: random crops draw fresh offsets on the next batch
    crop2 = np.asarray(preps[2](jnp.asarray(imgs)))
    assert not np.allclose(crop, crop2)
    assert crop.shape == ident.shape and flip_crop.shape == ident.shape
    # 5: brightness factor in U[0.9, 1.1] per image (ColorJitter(0.1));
    # check the implied per-image ratio on unclipped pixels
    denorm = lambda x: x * 0.25 + 0.5
    ratio = denorm(bright) / np.clip(denorm(ident), 1e-3, None)
    per_img = ratio.reshape(4, -1)
    med = np.median(per_img, axis=1)
    assert np.all(med > 0.899) and np.all(med < 1.101)
    assert np.std(med) > 0  # factors differ across images


def test_dashboard_and_transfer_plots(tmp_path):
    """EMA-distance panel, combined dashboard and transfer-summary figure
    (HQAViT_IN_Tiny.py:242-456, HQAViT_Tiny_Cifar10.py:196-258)."""
    logger = TrainingLogger(tmp_path, track_ema=True)
    for e in range(1, 6):
        logger.log_epoch(e, {
            "train_loss": 4.0 / e, "train_acc": 10.0 * e,
            "val_loss": 4.2 / e, "val_acc": 8.0 * e,
            "ema_val_loss": 4.1 / e, "ema_val_acc": 8.5 * e,
            "ema_param_dist": 0.1 / e, "lr": 1e-3 / e,
            "grad_norm": 0.5, "epoch_time": 9.0})
    assert logger.plot_dashboard() is not None
    assert logger.plot_ema_distance() is not None
    assert logger.plot_transfer_summary(72.65, "cifar100", "cifar10") \
        is not None
    for f in ("training_dashboard.png", "ema_distance.png",
              "final_summary.png"):
        assert (tmp_path / f).stat().st_size > 0
