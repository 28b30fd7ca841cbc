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
