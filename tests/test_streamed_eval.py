"""Streamed eval ranking (ops/streamed_eval.py) == materialised path.

The streamed path must reproduce scoring.topk_ranks(model.apply(...))
exactly — including lowest-index tie resolution across slab boundaries
— for every model and for MSGIFSR's REnorm/fusion head.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu.graph import builders
from sessionrec_tpu.graph.batch import (CcsBatch, CcsLevel, LessrBatch,
                                        SessionGraphBatch)
from sessionrec_tpu.models import LESSR, MSGIFSR, NISER, SRGNN
from sessionrec_tpu.ops import scoring
from sessionrec_tpu.ops.streamed_eval import (streamed_count_ranks,
                                              streamed_multi_count_ranks,
                                              streamed_multi_topk_ranks,
                                              streamed_topk_ranks)
from sessionrec_tpu.train.runner import make_eval_step

NUM_ITEMS = 700    # > 1 slab at tile=512 below
MAX_LEN = 10
B = 8


def _batch(rng, kind, order=1):
    lens = rng.integers(1, MAX_LEN, size=B - 1)
    seqs = [list(rng.integers(0, NUM_ITEMS, size=l)) for l in lens]
    labels = list(rng.integers(0, NUM_ITEMS, size=B - 1))
    if kind == "session":
        return SessionGraphBatch(
            **builders.build_session_batch(seqs, labels, MAX_LEN, B))
    if kind == "lessr":
        return LessrBatch(
            **builders.build_lessr_batch(seqs, labels, MAX_LEN, B))
    d = builders.build_ccs_batch(seqs, labels, order, MAX_LEN, B)
    return CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                    inter_in=tuple(d["inter_in"]),
                    inter_out=tuple(d["inter_out"]),
                    labels=d["labels"], valid=d["valid"])


def test_streamed_matches_global_topk_with_ties():
    """Hand-built score matrix with exact ties straddling slab edges."""
    P, k, tile = 1300, 5, 512
    rng = np.random.default_rng(0)
    table = rng.standard_normal((P, 16)).astype(np.float32)
    # engineer ties: rows 3,600,1100 of the table identical -> equal logits
    table[600] = table[3]
    table[1100] = table[3]
    sr = rng.standard_normal((4, 16)).astype(np.float32)
    labels = jnp.asarray([3, 600, 1100, 5])
    logits = jnp.asarray(sr @ table.T)
    want = scoring.topk_ranks(logits, labels, k)
    got = streamed_topk_ranks(jnp.asarray(sr), jnp.asarray(table), labels,
                              num_items=P, k=k, tile=tile)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("model_f,kind", [
    (lambda: SRGNN(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1),
     "session"),
    (lambda: NISER(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1),
     "session"),
    (lambda: LESSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=2),
     "lessr"),
    (lambda: MSGIFSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1),
     "ccs"),
])
def test_plain_head_models_match(model_f, kind):
    rng = np.random.default_rng(1)
    model = model_f()
    batch = _batch(rng, kind)
    params, state = model.init(jax.random.PRNGKey(0))
    params = model.project_params(params)

    log_probs, _ = model.apply(params, state, batch, training=False,
                               rng=None)
    want = scoring.topk_ranks(log_probs, batch.labels, 20)

    sr, table, _ = model.head(params, state, batch, training=False,
                              rng=None)
    got = streamed_topk_ranks(
        sr, table, batch.labels, num_items=model.num_items, k=20,
        scale=float(model.scale) if model.scale else 1.0,
        normalize_table=getattr(model, "table_norm", False), tile=512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("order,extra,fusion", [(2, True, False),
                                                (2, False, True),
                                                (3, True, True)])
def test_msgifsr_multi_head_matches(order, extra, fusion):
    rng = np.random.default_rng(2)
    model = MSGIFSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                    order=order, extra=extra, fusion=fusion)
    batch = _batch(rng, "ccs", order=order)
    params, state = model.init(jax.random.PRNGKey(3))
    params = model.project_params(params)

    log_probs, _ = model.apply(params, state, batch, training=False,
                               rng=None)
    want = scoring.topk_ranks(log_probs, batch.labels, 20)

    sr, table, phi, alpha, iids, _ = model.head_multi(
        params, state, batch, training=False, rng=None)
    got = streamed_multi_topk_ranks(
        sr, table, batch.labels, iids, phi, alpha,
        num_items=model.num_items, extra=extra, fusion=fusion, k=20,
        scale=float(model.scale), normalize_table=model.table_norm,
        tile=512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_eval_step_metrics_match():
    """make_eval_step(streamed=True) == streamed=False on hit/mrr/n."""
    rng = np.random.default_rng(4)
    model = MSGIFSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                    order=2, extra=True, fusion=True)
    batch = _batch(rng, "ccs", order=2)
    params, state = model.init(jax.random.PRNGKey(5))
    params = model.project_params(params)
    got = make_eval_step(model, streamed=True)(params, state, batch)
    want = make_eval_step(model, streamed=False)(params, state, batch)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_auto_stream_policy():
    """The auto-switch is an OOM hatch, not an optimisation: the 2^20
    design point (537M logits elements — measured 7.8x faster
    materialised, BENCH_NOTES round 4) must stay materialised; only
    >= 1G elements streams."""
    from sessionrec_tpu.train.runner import _auto_stream
    assert not _auto_stream(512, 1 << 20)     # 537M: materialise
    assert not _auto_stream(512, 37888)       # bench scale: materialise
    assert _auto_stream(512, 1 << 22)         # 2.1G: stream
    assert _auto_stream(2048, 1 << 20)        # 2.1G: stream


def test_streamed_count_matches_global_with_ties():
    """streamed_count_ranks == materialised counting == global top-k on a
    score matrix with exact ties straddling slab edges (same fixture as
    the merge-path test)."""
    P, k, tile = 1300, 5, 512
    rng = np.random.default_rng(0)
    table = rng.standard_normal((P, 16)).astype(np.float32)
    table[600] = table[3]
    table[1100] = table[3]
    sr = rng.standard_normal((4, 16)).astype(np.float32)
    labels = jnp.asarray([3, 600, 1100, 5])
    logits = jnp.asarray(sr @ table.T)
    want = scoring.topk_ranks(logits, labels, k)
    got = streamed_count_ranks(jnp.asarray(sr), jnp.asarray(table), labels,
                               num_items=P, k=k, tile=tile)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("model_f,kind", [
    (lambda: NISER(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1),
     "session"),
    (lambda: LESSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=2),
     "lessr"),
])
def test_streamed_count_plain_head_models_match(model_f, kind):
    rng = np.random.default_rng(2)
    model = model_f()
    batch = _batch(rng, kind)
    params, state = model.init(jax.random.PRNGKey(0))
    params = model.project_params(params)
    log_probs, _ = model.apply(params, state, batch, training=False,
                               rng=None)
    want = scoring.topk_ranks(log_probs, batch.labels, 20)
    sr, table, _ = model.head(params, state, batch, training=False,
                              rng=None)
    got = streamed_count_ranks(
        sr, table, batch.labels, num_items=model.num_items, k=20,
        normalize_table=getattr(model, "table_norm", False), tile=512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("order,extra,fusion", [(2, True, False),
                                                (2, False, True),
                                                (3, True, True)])
def test_msgifsr_multi_count_matches(order, extra, fusion):
    """Counting multi-order streamed ranks == apply-path top-k ranks."""
    rng = np.random.default_rng(6)
    model = MSGIFSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                    order=order, extra=extra, fusion=fusion)
    batch = _batch(rng, "ccs", order=order)
    params, state = model.init(jax.random.PRNGKey(7))
    params = model.project_params(params)
    log_probs, _ = model.apply(params, state, batch, training=False,
                               rng=None)
    want = scoring.topk_ranks(log_probs, batch.labels, 20)
    sr, table, phi, alpha, iids, _ = model.head_multi(
        params, state, batch, training=False, rng=None)
    got = streamed_multi_count_ranks(
        sr, table, batch.labels, iids, phi, alpha,
        num_items=model.num_items, extra=extra, fusion=fusion, k=20,
        scale=float(model.scale), normalize_table=model.table_norm,
        tile=512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
