"""Flat (raveled-vector) AdamW equivalence vs the per-leaf optax chain.

The flat path (qavit_tpu/train/flat_optim.py) performs the reference's
two-level clip + AdamW + weight-decay mask + LR schedule as a handful of
big vector ops.  These tests pin it elementwise to the per-leaf chain the
torch-parity tests validate (HQAViT_CIFAR100.py:1415-1439 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qavit_tpu.configs import TrainingConfig
from qavit_tpu.train import (create_train_state, make_optimizer,
                             make_schedule, make_train_step)
from qavit_tpu.train.flat_optim import (FlatAdamWState, flat_ema_update,
                                        make_flat_adamw)
from qavit_tpu.train.optim import apply_clipping


def _synthetic_tree(key):
    """Param tree exercising every masked path: a cnn_stem leaf (subtree
    pre-clip), a dwconv leaf, a write_norm leaf (no weight decay), a head
    leaf (LR-group multiplier), plus plain kernels."""
    ks = jax.random.split(key, 6)
    return {
        "cnn_stem": {"conv": {"kernel": jax.random.normal(ks[0], (3, 3, 4, 8))}},
        "block": {
            "dwconv": {"kernel": jax.random.normal(ks[1], (3, 3, 1, 16))},
            "swa": {"norm": {"scale": jax.random.normal(ks[2], (16,))},
                    "qkv": {"kernel": jax.random.normal(ks[3], (16, 48))}},
            "bank": {"write_norm": {"scale": jax.random.normal(ks[4], (16,))}},
        },
        "head": {"kernel": jax.random.normal(ks[5], (16, 10))},
    }


def _run_both(tc: TrainingConfig, n_steps=3):
    params0 = _synthetic_tree(jax.random.PRNGKey(0))
    sched = make_schedule(tc, steps_per_epoch=4)
    tx_tree = make_optimizer(tc.replace(flat_optimizer=False), 4, sched)
    tx_flat = make_flat_adamw(tc, sched)

    p_tree, s_tree = params0, tx_tree.init(params0)
    p_flat, s_flat = params0, tx_flat.init(params0)
    for i in range(n_steps):
        grads = jax.tree.map(
            lambda p: 0.05 * jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(7), i), p.shape) + 0.2 * p,
            params0)
        # tree path: clip in the step, then the chain
        g_clipped, gn_tree = apply_clipping(grads, tc)
        u_tree, s_tree = tx_tree.update(g_clipped, s_tree, p_tree)
        p_tree = optax.apply_updates(p_tree, u_tree)
        # flat path: clip inside the transform
        u_flat, s_flat = tx_flat.update(grads, s_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u_flat)
    return p_tree, p_flat, float(gn_tree), s_flat


def test_flat_matches_chain_default_config():
    tc = TrainingConfig(base_lr=3e-3, weight_decay=0.05)
    p_tree, p_flat, gn, s_flat = _run_both(tc)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_tree),
            jax.tree_util.tree_leaves_with_path(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7, err_msg=str(path))
    # the state's monitored norm matches the per-leaf computation
    assert np.isclose(float(s_flat.grad_norm), gn, rtol=1e-5)


def test_flat_matches_chain_value_clip_and_lr_groups():
    tc = TrainingConfig(base_lr=1e-3, weight_decay=0.02,
                        grad_clip_mode="value", max_grad_norm=0.01,
                        lr_groups="differential", head_lr_multiplier=10.0)
    p_tree, p_flat, _, _ = _run_both(tc)
    for a, b in zip(jax.tree.leaves(p_tree), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)
    # the head must actually have moved 10x-ish: sanity that the group
    # multiplier was applied at all
    d_head = np.abs(np.asarray(p_flat["head"]["kernel"])
                    - np.asarray(_synthetic_tree(jax.random.PRNGKey(0))
                                 ["head"]["kernel"])).mean()
    d_body = np.abs(np.asarray(p_flat["block"]["swa"]["qkv"]["kernel"])
                    - np.asarray(_synthetic_tree(jax.random.PRNGKey(0))
                                 ["block"]["swa"]["qkv"]["kernel"])).mean()
    assert d_head > 3 * d_body


def test_flat_rejects_non_f32():
    tc = TrainingConfig()
    tx = make_flat_adamw(tc, make_schedule(tc, 4))
    params = {"w": jnp.zeros((4,), jnp.bfloat16)}
    with pytest.raises(TypeError):
        tx.init(params)


def test_flat_ema_update_matches_tree():
    from qavit_tpu.train.state import ema_update
    params = _synthetic_tree(jax.random.PRNGKey(1))
    ema = _synthetic_tree(jax.random.PRNGKey(2))
    a = ema_update(ema, params, 0.99)
    b = flat_ema_update(ema, params, 0.99)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)


def test_flat_train_step_matches_tree_step(tiny_cfg, tiny_bundle, rng):
    """Whole-train-step integration equivalence on the real tiny hybrid
    model.  Elementwise param comparison is the WRONG instrument here:
    a handful of leaves (bias feeding BatchNorm, biases into softmaxes)
    have exactly-zero true gradients, so their f32 gradients are pure
    reduction-order noise that differs between the two compiled programs,
    and Adam's m/sqrt(v) amplifies that into O(lr) update flips (same
    finding as __graft_entry__.dryrun_multichip).  The math itself is
    pinned elementwise by the synthetic-tree tests above; here we assert
    the dryrun's functional instrument: identical losses, matching
    monitored norms, high update-sign agreement, and loss agreement on a
    FURTHER step taken with the trained params."""
    from jax.flatten_util import ravel_pytree

    model, variables = tiny_bundle
    images = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3], jnp.int32)

    losses, next_losses, metrics, deltas = [], [], [], []
    p0 = np.asarray(ravel_pytree(variables["params"])[0])
    for flat in (False, True):
        tc = TrainingConfig(batch_size=4, epochs=2, warmup_epochs=1,
                            use_ema=True, donate=False, flat_optimizer=flat,
                            log_param_norm=True)
        sched = make_schedule(tc, 4)
        tx = make_optimizer(tc, 4, sched)
        state = create_train_state(variables["params"], tx,
                                   variables.get("batch_stats"),
                                   use_ema=True)
        step = make_train_step(model, tx, tiny_cfg, tc, sched)
        m = None
        for _ in range(2):
            state, m = step(state, images, labels, rng)
        losses.append(float(m["loss"]))
        metrics.append(m)
        deltas.append(np.asarray(ravel_pytree(state.params)[0]) - p0)
        _, m3 = step(state, images, labels, rng)
        next_losses.append(float(m3["loss"]))

    assert np.isclose(losses[0], losses[1], rtol=1e-5)
    # monitored norms computed flat vs per-leaf agree to f32 noise
    assert np.isclose(float(metrics[0]["grad_norm"]),
                      float(metrics[1]["grad_norm"]), rtol=1e-5)
    assert np.isclose(float(metrics[0]["param_norm"]),
                      float(metrics[1]["param_norm"]), rtol=1e-5)
    # update directions agree except on zero-gradient noise elements
    sign_agree = np.mean(np.sign(deltas[0]) == np.sign(deltas[1]))
    assert sign_agree > 0.95, sign_agree
    # and the trained params are functionally equivalent: a further step
    # on the same batch sees the same loss (a wrong wd/clip/lr moves it)
    assert np.isclose(next_losses[0], next_losses[1], rtol=1e-4)


def test_flat_under_mesh_gspmd_equals_shardmap(rng):
    """tc.flat_optimizer composes with both DP step builders (VERDICT r2
    #10 discipline: mesh composition must be tested, not assumed): GSPMD
    and shard_map with the flat transform agree on losses per step."""
    from qavit_tpu.configs import ModelConfig
    from qavit_tpu.nn import build_model, init_model
    from qavit_tpu.parallel import (make_gspmd_train_step, make_mesh,
                                    make_shardmap_train_step, shard_batch)
    from qavit_tpu.parallel.mesh import DATA_AXIS

    cfg = ModelConfig(
        name="dp_tiny_flat", img_size=16, patch_size=4, num_classes=10,
        embed_dim=96, depth=1, num_heads=4, window_size=4,
        dilation_factors=(1, 2), linformer_k=8, msda_pad_len=32,
        hybrid=False, use_token_learner=False, stage_blocks=(1,),
        dtype="float32", dropout=0.0, drop_path=0.0)
    tc = TrainingConfig(batch_size=16, epochs=1, warmup_epochs=0,
                        use_ema=True, donate=False, flat_optimizer=True,
                        use_mixup=False, use_cutmix=False)
    mesh = make_mesh()
    sched = make_schedule(tc, 4)
    tx = make_optimizer(tc, 4, sched)
    assert isinstance(tx.init(
        init_model(cfg, jax.random.PRNGKey(3))[1]["params"]),
        FlatAdamWState)

    model_g, variables = init_model(cfg, jax.random.PRNGKey(3))
    model_s = build_model(cfg, pmean_axis=DATA_AXIS)

    def fresh_state():
        return create_train_state(variables["params"], tx,
                                  variables.get("batch_stats"),
                                  use_ema=True)

    step_g = make_gspmd_train_step(model_g, tx, cfg, tc, mesh, sched)
    step_s = make_shardmap_train_step(model_s, tx, cfg, tc, mesh, sched)

    xs = jax.random.normal(rng, (2, 16, 16, 16, 3))
    ys = jnp.tile(jnp.arange(8), (2, 2)).astype(jnp.int32)
    sg, ss = fresh_state(), fresh_state()
    for k in range(2):
        x, y = shard_batch(mesh, xs[k], ys[k])
        sg, mg = step_g(sg, x, y, rng)
        ss, ms = step_s(ss, xs[k], ys[k], rng)
        np.testing.assert_allclose(float(mg["loss"]), float(ms["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(mg["grad_norm"]),
                                   float(ms["grad_norm"]), rtol=1e-4)


def test_flat_state_is_checkpointable_pytree():
    tc = TrainingConfig()
    tx = make_flat_adamw(tc, make_schedule(tc, 4))
    s = tx.init(_synthetic_tree(jax.random.PRNGKey(0)))
    assert isinstance(s, FlatAdamWState)
    leaves = jax.tree.leaves(s)
    assert all(isinstance(l, jax.Array) for l in leaves)
    # round-trips through flatten/unflatten (what orbax relies on)
    treedef = jax.tree.structure(s)
    s2 = jax.tree.unflatten(treedef, leaves)
    assert isinstance(s2, FlatAdamWState)
