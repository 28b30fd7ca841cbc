"""Fused-block path: param-tree identity, numerics parity vs the flax
reference path, and bank-glue equality (VERDICT r1 #2)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.kernels.fused_block import finish_bank_update
from qavit_tpu.kernels.fused_params import declare_block_params
from qavit_tpu.kernels.fused_ref import bank_write_partial, make_geom
from qavit_tpu.nn import init_model
from qavit_tpu.nn.bank import BankState, bank_write


@pytest.fixture(scope="module")
def f32_cfg():
    """Flagship-geometry tiny config in fp32 (exact comparisons)."""
    return ModelConfig(
        name="fused_test", img_size=16, patch_size=4, num_classes=10,
        embed_dim=48, depth=2, num_heads=4, window_size=4,
        dilation_factors=(1, 2), linformer_k=8, msda_pad_len=32,
        hybrid=True, stem_kind="v1", cnn_c2=8, cnn_c3=12, cnn_c4=16,
        rrcv_channels=8, use_token_learner=True, num_learned_tokens=16,
        stage_blocks=(1, 1, 0, 0), dtype="float32", dropout=0.1,
    )


def test_geom_supported(f32_cfg):
    g = make_geom(f32_cfg)
    assert g is not None
    assert g.n == 16 and g.msda_keep == 10 and g.pool_stride == 2
    # flagship config is supported too
    from qavit_tpu.configs import get_preset
    assert make_geom(get_preset("hqavit_c100").model) is not None
    # multi-window geometries are supported too (flat 8x8 grid, window
    # 4 -> 4 windows of 16)
    g2 = make_geom(get_preset("qavit_v2_c100").model)
    assert g2 is not None and g2.nw == 4 and g2.ws2 == 16
    # non-square grids remain unsupported
    assert make_geom(
        get_preset("qavit_v2_c100").model.replace(window_size=3)) is None


def test_holder_tree_matches_reference(f32_cfg, rng):
    """declare_block_params must create the exact tree the flax
    QuadAttentionBlock creates (paths, shapes, init VALUES)."""
    from qavit_tpu.nn.block import QuadAttentionBlock
    from qavit_tpu.nn.bank import GlobalBankParams, bank_init_state

    cfg = f32_cfg
    geom = make_geom(cfg)

    class HolderBlk(nn.Module):
        @nn.compact
        def __call__(self):
            declare_block_params(cfg, geom)
            return 0

    class Holder(nn.Module):
        @nn.compact
        def __call__(self):
            return HolderBlk(name="blk")()

    class RefWrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            bank = GlobalBankParams(cfg.bank, cfg.embed_dim,
                                    name="global_bank")()
            state = bank_init_state(bank, 0)
            block = QuadAttentionBlock(cfg, None, dtype=jnp.float32,
                                       name="blk")
            (x, state), _ = block((x, state), 0.0, bank, False)
            return x

    x = jnp.zeros((1, 16, cfg.embed_dim))
    vh = Holder().init({"params": rng})
    vr = RefWrap().init({"params": rng, "dropout": rng}, x)
    ref_block = {k: v for k, v in vr["params"]["blk"].items()}
    hold = vh["params"]["blk"]

    ref_paths = jax.tree_util.tree_flatten_with_path(ref_block)[0]
    hold_paths = jax.tree_util.tree_flatten_with_path(hold)[0]
    assert [p for p, _ in ref_paths] == [p for p, _ in hold_paths]
    for (pr, vr_), (ph, vh_) in zip(ref_paths, hold_paths):
        assert vr_.shape == vh_.shape, pr
        np.testing.assert_array_equal(np.asarray(vr_), np.asarray(vh_),
                                      err_msg=str(pr))


def test_bank_glue_matches_bank_write(f32_cfg, rng):
    from qavit_tpu.nn.bank import GlobalBankParams

    cfg = f32_cfg
    bp = GlobalBankParams(cfg.bank, cfg.embed_dim).init(
        {"params": rng})["params"]
    bank_params = {k: jnp.asarray(v) for k, v in bp.items()}
    state = BankState(bank_params["global_k"].astype(jnp.float32),
                      bank_params["global_v"].astype(jnp.float32),
                      jnp.int32(5))
    tokens = jax.random.normal(rng, (6, 16, cfg.embed_dim))

    ref = bank_write(bank_params, cfg.bank, state, tokens, True, None)
    pk, pv = bank_write_partial(bank_params, tokens)
    got = finish_bank_update(cfg.bank, state, pk, pv, 6, None)
    np.testing.assert_allclose(np.asarray(ref.k), np.asarray(got.k),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ref.v), np.asarray(got.v),
                               rtol=1e-6, atol=1e-7)
    assert int(ref.count) == int(got.count)


def _logits(cfg, variables, x, train, rng=None):
    from qavit_tpu.nn import build_model

    model = build_model(cfg)
    kwargs = dict(train=train, bank_count=0)
    if train:
        out, _ = model.apply(variables, x, rngs={"dropout": rng},
                             mutable=["batch_stats"], **kwargs)
        return out
    return model.apply(variables, x, **kwargs)


def test_fused_matches_reference_eval(f32_cfg, rng):
    """Eval forward: fused path == flax path to fp32 tolerance."""
    cfg_ref = f32_cfg
    cfg_fused = f32_cfg.replace(attn_impl="fused_block")
    _, variables = init_model(cfg_ref, jax.random.PRNGKey(0))
    x = jax.random.normal(rng, (3, 16, 16, 3))
    lr, br = _logits(cfg_ref, variables, x, False)
    lf, bf = _logits(cfg_fused, variables, x, False)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(br.count),
                                  np.asarray(bf.count))


def test_fused_matches_reference_train_nodrop(f32_cfg, rng):
    """Train forward (bank writes active) with dropout/droppath zero:
    logits AND the evolved bank state must match."""
    cfg_ref = f32_cfg.replace(dropout=0.0, drop_path=0.0)
    cfg_fused = cfg_ref.replace(attn_impl="fused_block")
    _, variables = init_model(cfg_ref, jax.random.PRNGKey(0))
    x = jax.random.normal(rng, (3, 16, 16, 3))
    (lr, br) = _logits(cfg_ref, variables, x, True, rng)
    (lf, bf) = _logits(cfg_fused, variables, x, True, rng)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(br.k), np.asarray(bf.k),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(br.v), np.asarray(bf.v),
                               rtol=1e-5, atol=1e-6)
    assert int(br.count) == int(bf.count)


def test_fused_train_step_runs_with_dropout(f32_cfg, rng):
    """Full train step through the fused path with dropout ON: gradients
    flow (incl. into the bank params) and metrics are finite."""
    from qavit_tpu.configs import TrainingConfig
    from qavit_tpu.train import (create_train_state, make_optimizer,
                                 make_schedule, make_train_step)

    cfg = f32_cfg.replace(attn_impl="fused_block")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tc = TrainingConfig(batch_size=4, use_ema=True, donate=False)
    sched = make_schedule(tc, 10)
    tx = make_optimizer(tc, 10, sched)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"), use_ema=True)
    step = make_train_step(model, tx, cfg, tc, sched)
    x = jax.random.normal(rng, (4, 16, 16, 3))
    y = jnp.array([0, 1, 2, 3])
    state2, m = step(state, x, y, rng)
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0
    # bank advanced once per block (2 active blocks x 3 writes)
    assert int(state2.bank_count) == 6
    # bank params received read-gradients (global_k changed)
    dk = (np.asarray(state2.params["global_bank"]["global_k"])
          - np.asarray(state.params["global_bank"]["global_k"]))
    assert np.abs(dk).max() > 0
