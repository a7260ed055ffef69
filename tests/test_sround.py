"""Stochastic rounding (ops/sround.py) + bf16-table training path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sessionrec_tpu.ops.sround import stochastic_round_bf16


def test_exact_values_pass_through():
    # values already representable in bf16 must never be perturbed
    x = jnp.array([[1.0, -2.5, 0.0, 3.140625, 65280.0, -0.15625]],
                  dtype=jnp.float32)
    for seed in range(5):
        y = stochastic_round_bf16(x, seed)
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(x))


def test_rounds_to_neighbours():
    # every output must be one of the two bf16 neighbours of the input
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    lo = np.asarray(x.astype(jnp.bfloat16), np.float32)   # RTN, either side
    xs = np.asarray(x)
    for seed in (1, 2, 3):
        y = np.asarray(stochastic_round_bf16(x, seed), np.float32)
        # |y - x| <= one bf16 ulp at x's magnitude
        ulp = np.maximum(np.abs(xs), 1e-30) * 2.0 ** -7
        assert np.all(np.abs(y - xs) <= ulp)
        # SR must differ from round-to-nearest somewhere (8K elements)
        assert not np.array_equal(y, lo)


def test_unbiased():
    # mean over many seeds converges to x (the whole point of SR)
    x = jnp.full((4, 256), 1.0 + 1.3 * 2.0 ** -9, dtype=jnp.float32)
    acc = np.zeros((4, 256), np.float64)
    n = 200
    for seed in range(n):
        acc += np.asarray(stochastic_round_bf16(x, seed), np.float32)
    mean = acc / n
    # bf16 neighbours are 1.0 and 1.00390625; RTN would give 1.0 always
    assert abs(mean.mean() - float(x[0, 0])) < 2.0 ** -9 * 0.2


def test_nan_inf_passthrough():
    x = jnp.array([[jnp.nan, jnp.inf, -jnp.inf, 1.0]], dtype=jnp.float32)
    y = np.asarray(stochastic_round_bf16(x, 3), np.float32)
    assert np.isnan(y[0, 0]) and np.isposinf(y[0, 1]) and np.isneginf(y[0, 2])


@pytest.mark.parametrize("model_name", ["niser", "msgifsr"])
def test_bf16_table_trains(model_name):
    """A few optimizer steps with table_dtype=bfloat16: loss decreases,
    table stays bf16, max-norm invariant holds (msgifsr)."""
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import (CcsBatch, CcsLevel,
                                            SessionGraphBatch)
    from sessionrec_tpu.models import MSGIFSR, NISER
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import make_train_step

    rng = np.random.default_rng(0)
    B, num_items, max_len = 32, 200, 10
    seqs = [list(rng.integers(0, num_items, size=rng.integers(2, max_len)))
            for _ in range(B)]
    labels = list(rng.integers(0, num_items, size=B))
    if model_name == "msgifsr":
        model = MSGIFSR(num_items=num_items, embedding_dim=32, num_layers=1,
                        order=1, table_dtype="bfloat16")
        d = builders.build_ccs_batch(seqs, labels, 1, max_len, B)
        batch = CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                         inter_in=tuple(d["inter_in"]),
                         inter_out=tuple(d["inter_out"]),
                         labels=d["labels"], valid=d["valid"])
    else:
        model = NISER(num_items=num_items, embedding_dim=32, num_layers=1,
                      table_dtype="bfloat16")
        d = builders.build_session_batch(seqs, labels, max_len, B)
        batch = SessionGraphBatch(**d)

    params, state = model.init(jax.random.PRNGKey(0))
    assert params["embedding"].dtype == jnp.bfloat16
    params = model.project_params(params)
    tx = make_optimizer(params, lr=1e-2, weight_decay=1e-4,
                        steps_per_epoch=100)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(params, state, opt_state,
                                              batch, sub)
        losses.append(float(loss))
    assert params["embedding"].dtype == jnp.bfloat16
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    if model.has_max_norm:
        norms = np.linalg.norm(
            np.asarray(params["embedding"], np.float32), axis=-1)
        assert norms.max() <= 1.0 + 1e-2
