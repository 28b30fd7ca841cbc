import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.nn.layers import (
    CCFFFN,
    DepthwiseConv2d,
    DropPath,
    HybridFusion,
    LinformerCompression,
    PatchEmbed,
    resize_pos_embed,
)


def test_drop_path_eval_identity(rng):
    x = jnp.ones((4, 8, 16))
    m = DropPath()
    y = m.apply({}, x, 0.5, False)
    np.testing.assert_array_equal(y, x)


def test_drop_path_train_mask(rng):
    x = jnp.ones((512, 2, 2))
    m = DropPath()
    y = m.apply({}, x, 0.5, True, rngs={"dropout": rng})
    y = np.asarray(y)
    # per-sample: each sample either all-zero or all-2.0 (1/keep_prob)
    per_sample = y.reshape(512, -1)
    assert set(np.unique(per_sample)) <= {0.0, 2.0}
    frac_kept = (per_sample[:, 0] > 0).mean()
    assert 0.35 < frac_kept < 0.65
    # kept samples are scaled by 1/keep_prob
    assert np.allclose(per_sample[per_sample > 0], 2.0)


def test_patch_embed_matches_conv_math(rng):
    # PatchEmbed as reshape+Dense must equal a stride-p conv
    x = jax.random.normal(rng, (2, 8, 8, 3))
    m = PatchEmbed(patch_size=4, embed_dim=16, dtype=jnp.float32)
    v = m.init(rng, x)
    y = m.apply(v, x)
    assert y.shape == (2, 4, 16)
    # manual patch extraction -> dense(kernel) should agree (pre-LN); here
    # we check LN output determinism + shape only, plus grad flows
    g = jax.grad(lambda vv: m.apply(vv, x).sum())(v)
    assert jnp.isfinite(jax.flatten_util.ravel_pytree(g)[0]).all()


@pytest.mark.parametrize("n,seq_len", [(16, 16), (8, 16), (40, 16)])
def test_linformer_pad_truncate(rng, n, seq_len):
    # BNHD layout: [B, N, H, D]
    k = jax.random.normal(rng, (2, n, 4, 8))
    v = jax.random.normal(rng, (2, n, 4, 8))
    m = LinformerCompression(seq_len, 6, dtype=jnp.float32)
    variables = m.init(rng, k, v)
    k_c, v_c = m.apply(variables, k, v)
    assert k_c.shape == (2, 6, 4, 8)
    assert v_c.shape == (2, 6, 4, 8)


def test_hybrid_fusion_softmax_weights(rng):
    m = HybridFusion(4)
    branches = [jnp.ones((2, 3, 4)) * i for i in range(4)]
    v = m.init(rng, branches)
    out = m.apply(v, branches)
    assert out.shape == (2, 3, 16)
    # equal init weights -> each branch scaled by 0.25
    np.testing.assert_allclose(np.asarray(out[0, 0, 4:8]), 0.25, atol=1e-6)


def test_dwconv_shapes_and_scale(rng):
    x = jax.random.normal(rng, (2, 16, 8))
    m = DepthwiseConv2d(8, 3, stabilized=True, dtype=jnp.float32)
    v = m.init(rng, x, (4, 4))
    assert v["params"]["scale"].shape == (8,)
    np.testing.assert_allclose(np.asarray(v["params"]["scale"]), 0.1)
    y = m.apply(v, x, (4, 4))
    assert y.shape == x.shape


def test_ccfffn_stabilized_gamma(rng):
    x = jax.random.normal(rng, (2, 16, 8))
    m = CCFFFN(8, mlp_ratio=0.5, stabilized=True, dtype=jnp.float32)
    v = m.init({"params": rng, "dropout": rng}, x, False)
    assert "gamma" in v["params"]
    y = m.apply(v, x, False)
    assert y.shape == x.shape


def test_resize_pos_embed_bicubic():
    pe = jnp.arange(1 * 16 * 4, dtype=jnp.float32).reshape(1, 16, 4)
    out = resize_pos_embed(pe, 6)
    assert out.shape == (1, 36, 4)
    # identity resize is exact
    same = resize_pos_embed(pe, 4)
    np.testing.assert_allclose(np.asarray(same), np.asarray(pe), atol=1e-5)
