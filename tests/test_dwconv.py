"""Matmul-form depthwise conv == grouped conv (qavit_tpu/nn/dwconv.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.nn.dwconv import MATMUL_MAX_POSITIONS, MatmulDWConv


def _ref_conv(c, k, use_bias):
    return nn.Conv(c, (k, k), padding="SAME", feature_group_count=c,
                   use_bias=use_bias, dtype=jnp.float32)


@pytest.mark.parametrize("h,k,c,use_bias", [
    (8, 7, 96, True),      # ConvNeXt block geometry
    (8, 5, 192, True),     # LMFA 5x5
    (8, 3, 192, False),    # token-side stabilised dwconv
    (16, 7, 48, True),     # boundary: 256 positions still matmul
    (24, 7, 32, True),     # above threshold: falls back to grouped conv
])
def test_matmul_dwconv_matches_grouped_conv(h, k, c, use_bias):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, h, h, c), jnp.float32)
    m = MatmulDWConv(c, (k, k), use_bias=use_bias, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)
    ref = _ref_conv(c, k, use_bias)
    y = m.apply(params, x)
    y_ref = ref.apply(params, x)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_matmul_dwconv_param_tree_matches_nn_conv():
    x = jnp.zeros((1, 8, 8, 16), jnp.float32)
    p_new = MatmulDWConv(16, (7, 7)).init(jax.random.PRNGKey(0), x)
    p_ref = _ref_conv(16, 7, True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_new) == \
        jax.tree_util.tree_structure(p_ref)
    assert all(a.shape == b.shape for a, b in zip(
        jax.tree_util.tree_leaves(p_new), jax.tree_util.tree_leaves(p_ref)))


def test_matmul_dwconv_grads_match():
    c, k = 24, 7
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, c), jnp.float32)
    m = MatmulDWConv(c, (k, k), dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)
    ref = _ref_conv(c, k, True)

    def loss(fn, p):
        return jnp.sum(jnp.sin(fn.apply(p, x)))

    g_new = jax.grad(lambda p: loss(m, p))(params)
    g_ref = jax.grad(lambda p: loss(ref, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_new),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_threshold_constant_sane():
    assert MATMUL_MAX_POSITIONS == 256
