import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.kernels.attention import attention, xla_attention
from qavit_tpu.kernels.flash_attention import flash_attention


def _ref_attention(q, k, v):
    d = q.shape[-1]
    s = np.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bqk,bkd->bqd", p, v)


@pytest.mark.parametrize("shape", [(4, 16, 48, 48), (2, 64, 32, 24),
                                   (3, 100, 80, 64)])
def test_xla_attention_matches_numpy(rng, shape):
    bh, nq, nkv, d = shape
    q = np.random.RandomState(0).randn(bh, nq, d).astype(np.float32)
    k = np.random.RandomState(1).randn(bh, nkv, d).astype(np.float32)
    v = np.random.RandomState(2).randn(bh, nkv, d).astype(np.float32)
    out = xla_attention(jnp.asarray(q)[:, :, None], jnp.asarray(k)[:, :, None],
                        jnp.asarray(v)[:, :, None])[:, :, 0]
    np.testing.assert_allclose(np.asarray(out), _ref_attention(q, k, v),
                               atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 16, 48, 48), (2, 64, 144, 48)])
def test_pallas_interpret_matches_xla(rng, shape):
    bh, nq, nkv, d = shape
    q = jax.random.normal(rng, (bh, nq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, nkv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, nkv, d))
    out_p = flash_attention(q, k, v, interpret=True)
    out_x = xla_attention(q[:, :, None], k[:, :, None], v[:, :, None])[:, :, 0]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-4)


def test_attention_dispatch_cpu_uses_xla(rng):
    # on CPU backend the dispatcher must pick XLA regardless of shape
    q = jax.random.normal(rng, (1, 256, 2, 64))
    k = jax.random.normal(rng, (1, 64, 2, 64))
    v = jax.random.normal(rng, (1, 64, 2, 64))
    out = attention(q, k, v, impl="auto")
    assert out.shape == q.shape


def test_attention_rejects_unknown_impl(rng):
    # unknown impl strings must fail loudly, not silently route to the
    # raw Pallas kernel (a "default" typo used to reach pallas_call and
    # die with a cryptic JVP NotImplementedError under grad)
    import pytest
    q = jax.random.normal(rng, (1, 16, 1, 16))
    with pytest.raises(ValueError, match="unknown attention impl"):
        attention(q, q, q, impl="default")


def test_attention_dropout_scales(rng):
    q = jax.random.normal(rng, (1, 32, 1, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 1, 16))
    v = jnp.ones((1, 16, 1, 16))
    out = attention(q, k, v, dropout_rate=0.5, deterministic=False,
                    rng=jax.random.PRNGKey(2), impl="xla")
    # with v == 1, output rows are sums of kept, rescaled probs; the mean
    # should stay near 1
    assert 0.5 < float(out.mean()) < 1.5
