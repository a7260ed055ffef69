"""Optimizer dtype invariants (ADVICE r3, medium): with a bf16-stored
embedding table, Adam's mu/nu moments must be float32 — otherwise the
nu increment (1-b2)=1e-3 sits below bf16's half-ulp once nu is warm,
the second moment freezes, and 0.999*nu cannot decay."""

import jax
import jax.numpy as jnp
import numpy as np

from sessionrec_tpu.train.optim import make_optimizer


def _moment_leaves(opt_state, name):
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(opt_state):
        keys = [getattr(e, "name", getattr(e, "key", "")) for e in path]
        if name in keys and "embedding" in keys:
            out.append(leaf)
    return out


def test_bf16_table_moments_are_f32():
    params = {"embedding": jnp.zeros((16, 8), jnp.bfloat16),
              "w": jnp.zeros((8, 8), jnp.float32)}
    tx = make_optimizer(params, lr=1e-3, weight_decay=1e-4,
                        steps_per_epoch=10)
    opt_state = tx.init(params)
    mus = _moment_leaves(opt_state, "mu")
    nus = _moment_leaves(opt_state, "nu")
    assert mus and nus
    assert all(m.dtype == jnp.float32 for m in mus)
    assert all(n.dtype == jnp.float32 for n in nus)


def test_nu_decays_after_warm():
    """Regression for the frozen-nu failure: warm nu with a large grad,
    then feed zeros — nu must decay by b2 per step (impossible in bf16
    round-to-nearest once the increment is below half-ulp)."""
    params = {"embedding": jnp.full((4, 4), 0.5, jnp.bfloat16)}
    tx = make_optimizer(params, lr=1e-3, weight_decay=0.0,
                        steps_per_epoch=10)
    opt_state = tx.init(params)
    g_warm = {"embedding": jnp.full((4, 4), 1.0, jnp.bfloat16)}
    _, opt_state = tx.update(g_warm, opt_state, params)
    nu0 = float(_moment_leaves(opt_state, "nu")[0].ravel()[0])
    g_zero = {"embedding": jnp.zeros((4, 4), jnp.bfloat16)}
    for _ in range(3):
        _, opt_state = tx.update(g_zero, opt_state, params)
    nu3 = float(_moment_leaves(opt_state, "nu")[0].ravel()[0])
    assert np.isclose(nu3, nu0 * 0.999 ** 3, rtol=1e-5)
    assert nu3 < nu0


def test_update_dtype_is_f32_for_bf16_leaf():
    params = {"embedding": jnp.full((4, 4), 0.5, jnp.bfloat16)}
    tx = make_optimizer(params, lr=1e-3, weight_decay=1e-4,
                        steps_per_epoch=10)
    opt_state = tx.init(params)
    g = {"embedding": jnp.full((4, 4), 0.1, jnp.bfloat16)}
    updates, _ = tx.update(g, opt_state, params)
    assert updates["embedding"].dtype == jnp.float32
