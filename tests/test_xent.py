"""Parity tests: Pallas fused catalog cross-entropy (interpret mode on the
CPU test backend) vs the pure-jnp oracle, values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sessionrec_tpu.ops import xent


def _case(B, D, P, num_items, scale, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    sr = jnp.asarray(rng.normal(size=(B, D)), dtype)
    table = jnp.asarray(rng.normal(size=(P, D)), dtype)
    labels = jnp.asarray(rng.integers(0, num_items, size=B), jnp.int32)
    return sr, table, labels


@pytest.mark.parametrize("B,D,P,num_items,scale", [
    (8, 128, 512, 500, 1.0),
    (8, 128, 1024, 1000, 12.0),
    (16, 64, 512, 300, 12.0),        # D < lane width (padded internally)
    (5, 32, 700, 650, 1.0),          # nothing aligned
])
def test_forward_parity(B, D, P, num_items, scale):
    sr, table, labels = _case(B, D, P, num_items, scale)
    got = xent.catalog_xent(sr, table, labels, scale=scale,
                            num_items=num_items)
    want = xent.reference_xent(sr, table, labels, scale=scale,
                               num_items=num_items)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,D,P,num_items,scale", [
    (8, 128, 512, 500, 1.0),
    (8, 64, 1024, 1000, 12.0),
    (5, 32, 700, 650, 12.0),
])
def test_grad_parity(B, D, P, num_items, scale):
    sr, table, labels = _case(B, D, P, num_items, scale, seed=1)
    valid = jnp.ones((B,), jnp.float32).at[-1].set(0.0)   # one masked row

    def loss_fused(sr, table):
        return xent.fused_nll_loss(sr, table, labels, valid, scale=scale,
                                   num_items=num_items, use_pallas=True)

    def loss_ref(sr, table):
        return xent.fused_nll_loss(sr, table, labels, valid, scale=scale,
                                   num_items=num_items, use_pallas=False)

    lf, (gsr_f, gtab_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(
        sr, table)
    lr, (gsr_r, gtab_r) = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        sr, table)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gsr_f), np.asarray(gsr_r),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gtab_f), np.asarray(gtab_r),
                               rtol=1e-3, atol=2e-4)


def test_grad_through_l2norm_chain():
    """The fused op composes with autodiff through the NISER-style
    normalisation of sr and table."""
    from sessionrec_tpu.models.layers import l2norm
    B, D, P, n = 8, 64, 512, 500
    sr, table, labels = _case(B, D, P, n, 12.0, seed=2)
    valid = jnp.ones((B,), jnp.float32)

    def make(use_pallas):
        def f(sr, table):
            return xent.fused_nll_loss(l2norm(sr), l2norm(table), labels,
                                       valid, scale=12.0, num_items=n,
                                       use_pallas=use_pallas)
        return f

    gf = jax.grad(make(True), argnums=(0, 1))(sr, table)
    gr = jax.grad(make(False), argnums=(0, 1))(sr, table)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_bfloat16_inputs():
    B, D, P, n = 8, 128, 512, 500
    sr, table, labels = _case(B, D, P, n, 1.0, dtype=jnp.bfloat16)
    got = xent.catalog_xent(sr, table, labels, scale=1.0, num_items=n)
    want = xent.reference_xent(sr, table, labels, scale=1.0, num_items=n)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2, atol=1e-2)


def test_padded_rows_excluded():
    """Rows of `table` beyond num_items never receive probability mass:
    shrinking num_items changes the loss; enlarging P with junk does not."""
    B, D, n = 8, 64, 500
    sr, table, labels = _case(B, D, 512, n, 1.0, seed=3)
    base = xent.catalog_xent(sr, table, labels, scale=1.0, num_items=n)
    junk = jnp.concatenate([table, 100.0 * jnp.ones((512, D))], axis=0)
    with_junk = xent.catalog_xent(sr, junk, labels, scale=1.0, num_items=n)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_junk),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_normalize_table_parity(dtype):
    """Folded l2norm(table) matches normalising outside the op, values and
    grads (including rows with norm > 1 and ~0)."""
    B, D, P, n, scale = 8, 64, 512, 500, 12.0
    sr, table, labels = _case(B, D, P, n, scale, seed=4, dtype=dtype)
    table = table.at[3].multiply(50.0).at[7].multiply(1e-14)
    valid = jnp.ones((B,), jnp.float32)

    def fused(sr, table):
        return xent.fused_nll_loss(sr, table, labels, valid, scale=scale,
                                   num_items=n, normalize_table=True,
                                   use_pallas=True)

    def ref(sr, table):
        from sessionrec_tpu.models.layers import l2norm
        return xent.fused_nll_loss(sr, l2norm(table), labels, valid,
                                   scale=scale, num_items=n,
                                   use_pallas=False)

    lf, gf = jax.value_and_grad(fused, argnums=(0, 1))(sr, table)
    lr, gr = jax.value_and_grad(ref, argnums=(0, 1))(sr, table)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)
