"""The unrolled (lax.scan) train/eval steps must be numerically identical
to per-step dispatch — same losses, same params — including when the
final chunk is padded with all-invalid batches (the padded steps must be
skipped entirely, preserving weight-decay and LR-schedule semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu.graph import builders
from sessionrec_tpu.graph.batch import SessionGraphBatch
from sessionrec_tpu.models import NISER
from sessionrec_tpu.train.optim import make_optimizer
from sessionrec_tpu.train.runner import (make_eval_step,
                                         make_train_step,
                                         make_unrolled_eval_step,
                                         make_unrolled_train_step,
                                         stack_batches)

NUM_ITEMS = 80
MAX_LEN = 6
B = 8


def _batches(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        seqs = [list(rng.integers(0, NUM_ITEMS,
                                  size=rng.integers(1, MAX_LEN + 1)))
                for _ in range(B)]
        labels = list(rng.integers(0, NUM_ITEMS, size=B))
        out.append(SessionGraphBatch(
            **builders.build_session_batch(seqs, labels, MAX_LEN, B)))
    return out


def _fresh():
    model = NISER(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                  feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-2, weight_decay=1e-4,
                        steps_per_epoch=10)
    return model, params, state, tx


def test_unrolled_matches_per_step():
    batches = _batches(6)
    rngs = jax.random.split(jax.random.PRNGKey(1), 6)

    model, params, state, tx = _fresh()
    multi = make_unrolled_train_step(model, tx, 6)
    p1, s1, o1, losses = multi(params, state, tx.init(params),
                               stack_batches(batches, 6), rngs)

    model, params, state, tx = _fresh()
    single = make_train_step(model, tx)
    p2, s2, o2 = params, state, tx.init(params)
    l2 = []
    for i in range(6):
        p2, s2, o2, l = single(p2, s2, o2, batches[i], rngs[i])
        l2.append(float(l))

    np.testing.assert_allclose(np.asarray(losses), np.asarray(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_padded_chunk_steps_are_skipped():
    """3 real batches padded to a chunk of 6: identical result to running
    exactly the 3 real steps (no spurious weight decay / opt count)."""
    batches = _batches(3, seed=2)
    rngs = jax.random.split(jax.random.PRNGKey(3), 6)

    model, params, state, tx = _fresh()
    multi = make_unrolled_train_step(model, tx, 6)
    p1, _, o1, losses = multi(params, state, tx.init(params),
                              stack_batches(batches, 6), rngs)
    assert np.allclose(np.asarray(losses)[3:], 0.0)

    model, params, state, tx = _fresh()
    single = make_train_step(model, tx)
    p2, s2, o2 = params, state, tx.init(params)
    for i in range(3):
        p2, s2, o2, _ = single(p2, s2, o2, batches[i], rngs[i])

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # optimizer step count advanced by exactly 3
    counts = [int(x) for x in jax.tree_util.tree_leaves(o1)
              if np.asarray(x).dtype == np.int32 and np.asarray(x).ndim == 0]
    assert 3 in counts, counts


def test_max_norm_projection_invariant():
    """The train step returns max-norm-projected params (the projection
    now runs fused into the update pass, not at step entry): after steps
    with real gradients every embedding row of a max-norm model stays
    inside the unit ball, so the next step's gradients are taken at the
    projected table — torch's lookup-time ``max_norm=1`` semantics
    (reference: lessr.py:126)."""
    from sessionrec_tpu.graph.batch import LessrBatch
    from sessionrec_tpu.models import LESSR

    model = LESSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=2,
                  feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(0))
    # blow the table out of the ball; the runner-side init projection
    # (TrainRunner.__init__) is what re-establishes the invariant
    params["embedding"] = params["embedding"] * 10.0
    params = jax.jit(model.project_params)(params)
    norms0 = jnp.linalg.norm(params["embedding"], axis=-1)
    assert float(jnp.max(norms0)) <= 1.0 + 1e-5

    tx = make_optimizer(params, lr=5e-2, weight_decay=1e-4,
                        steps_per_epoch=10)
    step = make_train_step(model, tx)
    opt_state = tx.init(params)
    rng = np.random.default_rng(7)
    seqs = [list(rng.integers(0, NUM_ITEMS,
                              size=rng.integers(2, MAX_LEN + 1)))
            for _ in range(B)]
    labels = list(rng.integers(0, NUM_ITEMS, size=B))
    batch = LessrBatch(**builders.build_lessr_batch(seqs, labels, MAX_LEN, B))
    for i in range(3):
        params, state, opt_state, loss = step(
            params, state, opt_state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
        norms = jnp.linalg.norm(params["embedding"], axis=-1)
        assert float(jnp.max(norms)) <= 1.0 + 1e-5


def test_unrolled_eval_matches_per_batch():
    batches = _batches(5, seed=4)
    model, params, state, _ = _fresh()
    ev1 = make_unrolled_eval_step(model, cutoff=20)
    h1, m1, n1 = ev1(params, state, stack_batches(batches, 5))
    ev2 = make_eval_step(model, cutoff=20)
    h2 = m2 = n2 = 0.0
    for b in batches:
        h, m, n = ev2(params, state, b)
        h2 += float(h)
        m2 += float(m)
        n2 += float(n)
    assert float(n1) == n2 == 5 * B
    np.testing.assert_allclose(float(h1), h2)
    np.testing.assert_allclose(float(m1), m2, rtol=1e-6)


def test_eval_rank_methods_identical():
    """rank_method="count" must reproduce the top-k eval bit-for-bit
    (same hit / mrr / n) on a real model — "count" is the measured-on
    default (runner._use_count_ranks), "topk" the reference-shaped A/B
    knob, so the two must be interchangeable."""
    batches = _batches(4, seed=9)
    model, params, state, _ = _fresh()
    out = {}
    for method in ("topk", "count"):
        ev = make_eval_step(model, cutoff=20, rank_method=method)
        h = m = n = 0.0
        for b in batches:
            hh, mm, nn = ev(params, state, b)
            h += float(hh)
            m += float(mm)
            n += float(nn)
        out[method] = (h, m, n)
    assert out["topk"] == out["count"]


def test_eval_head_fastpath_matches_apply_path():
    """The plain-head eval fast path (raw masked logits, no log_softmax)
    must produce the same ranks as ranking model.apply's log-probs —
    log_softmax and positive scaling are monotone and tie-preserving, so
    hit/mrr/n agree exactly."""
    from sessionrec_tpu.ops import scoring
    from sessionrec_tpu.models import LESSR, MSGIFSR
    from sessionrec_tpu.graph.batch import CcsBatch, CcsLevel, LessrBatch

    rng = np.random.default_rng(11)
    seqs = [list(rng.integers(0, NUM_ITEMS,
                              size=rng.integers(1, MAX_LEN + 1)))
            for _ in range(B)]
    labels = list(rng.integers(0, NUM_ITEMS, size=B))

    cases = []
    model, params, state, _ = _fresh()          # NISER (table_norm)
    d = builders.build_session_batch(seqs, labels, MAX_LEN, B)
    cases.append((model, params, state, SessionGraphBatch(**d)))

    model = LESSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=2,
                  feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(2))
    d = builders.build_lessr_batch(seqs, labels, MAX_LEN, B)
    cases.append((model, params, state, LessrBatch(**d)))

    model = MSGIFSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                    order=1, feat_drop=0.0)     # plain head (no REnorm)
    params, state = model.init(jax.random.PRNGKey(3))
    d = builders.build_ccs_batch(seqs, labels, 1, MAX_LEN, B)
    batch = CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                     inter_in=tuple(d["inter_in"]),
                     inter_out=tuple(d["inter_out"]),
                     labels=d["labels"], valid=d["valid"])
    cases.append((model, params, state, batch))

    for model, params, state, batch in cases:
        assert model.has_plain_head
        ev = make_eval_step(model, cutoff=20)
        h, m, n = ev(params, state, batch)
        # oracle: the reference-shaped path — full log-probs + top-k
        pp = model.project_params(params)
        log_probs, _ = model.apply(pp, state, batch, training=False,
                                   rng=None)
        ranks = scoring.topk_ranks(log_probs, batch.labels, 20)
        v = batch.valid
        want_h = float(jnp.sum((ranks > 0) * v))
        want_m = float(jnp.sum(jnp.where(
            ranks > 0, 1.0 / jnp.maximum(ranks, 1), 0.0) * v))
        assert float(h) == want_h, type(model).__name__
        np.testing.assert_allclose(float(m), want_m, rtol=1e-6,
                                   err_msg=type(model).__name__)
