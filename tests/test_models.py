"""Model-level checks: shapes, probability normalisation, determinism,
and gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu.graph import builders
from sessionrec_tpu.graph.batch import (CcsBatch, CcsLevel, LessrBatch,
                                        SessionGraphBatch)
from sessionrec_tpu.models import LESSR, MSGIFSR, NISER, SRGNN

NUM_ITEMS = 50
MAX_LEN = 8
SEQS = [[1, 2, 3, 2], [5], [7, 8, 7, 8, 9], [4, 4, 4]]
LABELS = [4, 6, 1, 2]


def session_batch(B=4):
    d = builders.build_session_batch(SEQS[:B], LABELS[:B], MAX_LEN, B)
    return SessionGraphBatch(**d)


def lessr_batch(B=4):
    d = builders.build_lessr_batch(SEQS[:B], LABELS[:B], MAX_LEN, B)
    return LessrBatch(**d)


def ccs_batch(order, B=4):
    d = builders.build_ccs_batch(SEQS[:B], LABELS[:B], order, MAX_LEN, B)
    return CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                    inter_in=tuple(d["inter_in"]),
                    inter_out=tuple(d["inter_out"]),
                    labels=d["labels"], valid=d["valid"])


def _check_logprobs(lp, num_items):
    lp = np.asarray(lp)
    assert not np.isnan(lp).any()
    # probs over real items sum to 1
    np.testing.assert_allclose(np.exp(lp[:, :num_items]).sum(-1), 1.0,
                               rtol=1e-4)
    # padded columns are effectively -inf
    assert (lp[:, num_items:] < -1e6).all()


@pytest.mark.parametrize("cls,kw,batch_fn", [
    (SRGNN, dict(embedding_dim=16, num_layers=2), session_batch),
    (NISER, dict(embedding_dim=16, num_layers=2), session_batch),
    (LESSR, dict(embedding_dim=16, num_layers=3), lessr_batch),
    (MSGIFSR, dict(embedding_dim=16, num_layers=1, order=1), lambda: ccs_batch(1)),
    pytest.param(MSGIFSR, dict(embedding_dim=16, num_layers=1, order=3),
                 lambda: ccs_batch(3), marks=pytest.mark.slow),
    pytest.param(MSGIFSR, dict(embedding_dim=16, num_layers=2, order=2,
                               extra=True, fusion=True),
                 lambda: ccs_batch(2), marks=pytest.mark.slow),
])
def test_forward_shapes_and_normalisation(cls, kw, batch_fn):
    model = cls(num_items=NUM_ITEMS, feat_drop=0.1, **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = batch_fn()
    lp, _ = model.apply(params, state, batch, training=False, rng=None)
    assert lp.shape == (4, model.padded_items)
    _check_logprobs(lp, NUM_ITEMS)
    # training mode with dropout rng also finite
    lp_t, new_state = model.apply(params, state, batch, training=True,
                                  rng=jax.random.PRNGKey(1))
    assert not np.isnan(np.asarray(lp_t)).any()


@pytest.mark.parametrize("cls,kw,batch_fn", [
    (SRGNN, dict(embedding_dim=16, num_layers=1), session_batch),
    (LESSR, dict(embedding_dim=16, num_layers=2), lessr_batch),
    pytest.param(MSGIFSR, dict(embedding_dim=16, num_layers=1, order=2,
                               extra=True),
                 lambda: ccs_batch(2), marks=pytest.mark.slow),
])
def test_gradients_flow_and_are_finite(cls, kw, batch_fn):
    from sessionrec_tpu.ops import scoring
    model = cls(num_items=NUM_ITEMS, feat_drop=0.0, **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = batch_fn()

    def loss_fn(p):
        lp, _ = model.apply(p, state, batch, training=True,
                            rng=jax.random.PRNGKey(0))
        return scoring.nll_loss(lp, batch.labels, batch.valid)

    loss, grads = jax.value_and_grad(loss_fn)(model.project_params(params))
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the embedding gets gradient
    assert float(jnp.abs(grads["embedding"]).sum()) > 0


def test_srgnn_reference_quirk_gnn_output_unused():
    """Parity check of SURVEY.md §7.4: with readout_on_embedding=True the
    GNN layer params receive zero gradient (srgnn.py:141-142)."""
    from sessionrec_tpu.ops import scoring
    model = SRGNN(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = session_batch()

    def loss_fn(p):
        lp, _ = model.apply(p, state, batch, training=False, rng=None)
        return scoring.nll_loss(lp, batch.labels, batch.valid)

    grads = jax.grad(loss_fn)(params)
    layer_norm = sum(float(jnp.abs(g).sum())
                     for g in jax.tree_util.tree_leaves(grads["layers"]))
    assert layer_norm == 0.0
    # and the fixed dataflow does train the layers
    model2 = SRGNN(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                   readout_on_embedding=False)
    grads2 = jax.grad(lambda p: loss_fn_for(model2, p, state, batch))(params)
    layer_norm2 = sum(float(jnp.abs(g).sum())
                      for g in jax.tree_util.tree_leaves(grads2["layers"]))
    assert layer_norm2 > 0.0


def loss_fn_for(model, p, state, batch):
    from sessionrec_tpu.ops import scoring
    lp, _ = model.apply(p, state, batch, training=False, rng=None)
    return scoring.nll_loss(lp, batch.labels, batch.valid)


def test_lessr_max_norm_projection():
    model = LESSR(num_items=NUM_ITEMS, embedding_dim=8, num_layers=1)
    params, _ = model.init(jax.random.PRNGKey(0))
    proj = model.project_params(params)
    norms = np.linalg.norm(np.asarray(proj["embedding"]), axis=-1)
    assert (norms <= 1.0 + 1e-5).all()
    # rows already under the cap are untouched
    small = params["embedding"] * 1e-3
    proj2 = model.project_params({**params, "embedding": small})
    np.testing.assert_allclose(np.asarray(proj2["embedding"]),
                               np.asarray(small))


def test_padded_rows_do_not_affect_real_rows():
    """A batch padded with empty rows must score real rows identically."""
    model = NISER(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                  feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(0))
    d2 = builders.build_session_batch(SEQS[:2], LABELS[:2], MAX_LEN, 2)
    d4 = builders.build_session_batch(SEQS[:2], LABELS[:2], MAX_LEN, 4)
    lp2, _ = model.apply(params, state, SessionGraphBatch(**d2))
    lp4, _ = model.apply(params, state, SessionGraphBatch(**d4))
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(lp4)[:2],
                               atol=1e-5)


@pytest.mark.parametrize("make", [
    lambda: SRGNN(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                  compute_dtype="bfloat16"),
    lambda: NISER(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                  compute_dtype="bfloat16"),
    pytest.param(
        lambda: LESSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=2,
                      compute_dtype="bfloat16"),
        marks=pytest.mark.slow),
    pytest.param(
        lambda: MSGIFSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                        order=2, extra=True, fusion=True,
                        compute_dtype="bfloat16"),
        marks=pytest.mark.slow),
])
def test_bfloat16_compute_path(make):
    """bf16 compute must stay finite, normalised, and close to f32 in both
    values and gradients (f32 masters, bf16 matmuls, f32 accumulation)."""
    model = make()
    model32 = model.__class__(**{**model.__dict__, "compute_dtype": "float32"})
    params, state = model.init(jax.random.PRNGKey(0))
    if model.graph_kind == "session":
        batch = session_batch()
    elif model.graph_kind == "lessr":
        batch = lessr_batch()
    else:
        batch = ccs_batch(order=2)

    lp16, _ = model.apply(params, state, batch, training=False, rng=None)
    lp32, _ = model32.apply(params, state, batch, training=False, rng=None)
    assert lp16.dtype == jnp.float32          # log-probs stay f32
    _check_logprobs(lp16, NUM_ITEMS)
    real = np.asarray(lp32)[:, :NUM_ITEMS]
    got = np.asarray(lp16)[:, :NUM_ITEMS]
    # bf16 has ~3 significant digits; log-probs land within ~1e-1
    np.testing.assert_allclose(got, real, atol=0.15)

    g16 = jax.grad(lambda p: loss_fn_for(model, p, state, batch))(params)
    assert g16["embedding"].dtype == jnp.float32   # grads on f32 masters
    flat = jax.tree_util.tree_leaves(g16)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
