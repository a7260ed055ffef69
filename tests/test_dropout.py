"""Pallas dropout kernel: mask statistics, scaling, and the
recompute-in-backward contract (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from sessionrec_tpu.ops.dropout import dropout


def test_keep_rate_and_scaling():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4096, 128), jnp.float32)
    rate = 0.3
    y = np.asarray(dropout(key, x, rate, use_pallas=True))
    kept = y != 0.0
    # kept elements are scaled by 1/keep
    np.testing.assert_allclose(y[kept], 1.0 / 0.7, rtol=1e-6)
    # empirical keep rate within 4 sigma
    p = kept.mean()
    sigma = np.sqrt(0.7 * 0.3 / y.size)
    assert abs(p - 0.7) < 4 * sigma, p


def test_backward_uses_same_mask():
    key = jax.random.PRNGKey(1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, 64)),
                    jnp.float32)

    def f(x):
        return jnp.sum(dropout(key, x, 0.5, use_pallas=True) ** 2)

    y = dropout(key, x, 0.5, use_pallas=True)
    g = jax.grad(f)(x)
    # dy/dx = 2 * y * mask/keep  ->  grad is 0 exactly where y is 0, and
    # 2*y/keep... mask/keep applied twice: g = 2 * x * (mask/keep)^2
    zero = np.asarray(y) == 0.0
    gn = np.asarray(g)
    assert np.all(gn[zero] == 0.0)
    expect = 2.0 * np.asarray(x)[~zero] * 4.0   # (1/keep)^2 = 4
    np.testing.assert_allclose(gn[~zero], expect, rtol=1e-5)


def test_different_keys_different_masks():
    x = jnp.ones((256, 128), jnp.float32)
    a = np.asarray(dropout(jax.random.PRNGKey(2), x, 0.5, use_pallas=True))
    b = np.asarray(dropout(jax.random.PRNGKey(3), x, 0.5, use_pallas=True))
    assert (a != b).any()


def test_nd_shapes():
    key = jax.random.PRNGKey(4)
    x = jnp.ones((8, 20, 1, 256), jnp.float32)
    y = dropout(key, x, 0.1, use_pallas=True)
    assert y.shape == x.shape
