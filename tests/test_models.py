import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.configs import get_preset, list_presets
from qavit_tpu.nn import init_model


def _fwd(cfg, rng, train, bundle=None):
    model, variables = bundle if bundle is not None else init_model(cfg, rng)
    x = jax.random.normal(rng, (2, cfg.img_size, cfg.img_size, 3))
    kwargs = dict(train=train, bank_count=0)
    if train:
        out = model.apply(variables, x, rngs={"dropout": rng},
                          mutable=["batch_stats"], **kwargs)
        (logits, bank), _ = out
    else:
        logits, bank = model.apply(variables, x, **kwargs)
    return logits, bank, variables


def test_hqavit_forward_shapes(tiny_cfg, tiny_bundle, rng):
    logits, bank, variables = _fwd(tiny_cfg, rng, train=False, bundle=tiny_bundle)
    assert logits.shape == (2, tiny_cfg.num_classes)
    assert logits.dtype == jnp.float32
    assert int(bank.count) == 0


def test_hqavit_train_bank_writes(tiny_cfg, tiny_bundle, rng):
    logits, bank, variables = _fwd(tiny_cfg, rng, train=True, bundle=tiny_bundle)
    # 3 writing branches per block x depth blocks
    assert int(bank.count) == 3 * tiny_cfg.depth
    k0 = variables["params"]["global_bank"]["global_k"]
    assert not np.allclose(np.asarray(bank.k), np.asarray(k0))


def test_qavit_plain_forward(tiny_plain_cfg, tiny_plain_bundle, rng):
    logits, bank, _ = _fwd(tiny_plain_cfg, rng, train=True, bundle=tiny_plain_bundle)
    assert logits.shape == (2, tiny_plain_cfg.num_classes)
    assert int(bank.count) == 3 * tiny_plain_cfg.depth


def test_convnext_stem_variant(tiny_cfg, rng):
    cfg = tiny_cfg.replace(stem_kind="convnext")
    logits, _, variables = _fwd(cfg, rng, train=False)
    assert logits.shape == (2, cfg.num_classes)
    # v2 stem has no BatchNorm -> no batch_stats
    assert not variables.get("batch_stats")


def test_no_token_learner_variant(tiny_cfg, rng):
    cfg = tiny_cfg.replace(use_token_learner=False)
    logits, _, _ = _fwd(cfg, rng, train=False)
    assert logits.shape == (2, cfg.num_classes)


def test_nan_guard_zeroes_logits(tiny_cfg, tiny_bundle, rng):
    """NaN inputs must not propagate NaNs through guarded attention
    (efficient_attention zero-fallback, QAViT.py:261-289)."""
    model, variables = tiny_bundle
    x = jnp.full((2, 16, 16, 3), jnp.nan, jnp.float32)
    logits, _ = model.apply(variables, x, train=False, bank_count=0)
    # attention outputs were zeroed; downstream convs/residuals still see
    # NaN input (as in the reference, only attention is guarded) but the
    # forward must complete.
    assert logits.shape == (2, tiny_cfg.num_classes)


def test_nan_guard_zeroes_attention_output(rng):
    """The guard itself: NaN anywhere in q/k/v -> exactly-zero output;
    without the guard the NaN propagates (QAViT.py:261-289)."""
    from qavit_tpu.nn.branches import guarded_attention

    kq, kk = jax.random.split(rng)
    q = jax.random.normal(kq, (2, 8, 2, 16), jnp.float32)
    k = jax.random.normal(kk, (2, 8, 2, 16), jnp.float32)
    v = jnp.ones((2, 8, 2, 16), jnp.float32)
    k_bad = k.at[1, 3, 0, 2].set(jnp.nan)

    out = guarded_attention(q, k_bad, v, dropout=0.0, train=False, rng=None,
                            impl="xla", guard=True)
    assert jnp.all(out == 0.0), "guard must zero the whole output"

    unguarded = guarded_attention(q, k_bad, v, dropout=0.0, train=False,
                                  rng=None, impl="xla", guard=False)
    assert jnp.isnan(unguarded).any(), "without the guard NaNs propagate"

    # clean inputs pass through the guard untouched
    clean = guarded_attention(q, k, v, dropout=0.0, train=False, rng=None,
                              impl="xla", guard=True)
    assert jnp.isfinite(clean).all() and not jnp.all(clean == 0.0)


def test_all_presets_construct():
    for name in list_presets():
        p = get_preset(name)
        assert p.model.num_patches >= 16
        assert sum(p.model.stage_blocks) == p.model.depth


@pytest.mark.slow
def test_param_count_matches_reference():
    """HQAViT CIFAR-100 must match the reference exactly: 6,472,037
    (sum of the finetune log's parameter groups)."""
    p = get_preset("hqavit_c100")
    _, variables = init_model(p.model, jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n == 6_472_037
