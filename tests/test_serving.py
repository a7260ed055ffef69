"""Serving path: checkpoint -> batched top-k recommendations.

The reference has no inference surface (top-k indices are computed and
discarded, train.py:45-53); serving.py adds one.  These tests train a
tiny model with checkpointing, then drive `cli predict` end-to-end and
check the recommendation contract (exact == global top-k of the model's
log-probs; approx returns k valid ids)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu import serving
from sessionrec_tpu.cli import main
from sessionrec_tpu.graph import builders
from sessionrec_tpu.graph.batch import SessionGraphBatch
from sessionrec_tpu.models import NISER
from sessionrec_tpu.ops import scoring


def test_recommend_exact_matches_apply_topk():
    """Exact serving ids == top-k of model.apply's log-probs on full
    sessions (the raw-logit fast path is rank-equivalent)."""
    model = NISER(num_items=60, embedding_dim=16, num_layers=1,
                  feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sessions = [list(rng.integers(0, 60, size=rng.integers(1, 6)))
                for _ in range(7)]
    got = list(serving.recommend(model, params, state, sessions,
                                 max_len=6, k=10, batch_size=4))
    assert len(got) == 7
    pp = model.project_params(params)
    for sess, ids, scores in got:
        batch = SessionGraphBatch(**builders.build_session_batch(
            [list(sess)], [0], 6, 1))
        lp, _ = model.apply(pp, state, batch, training=False, rng=None)
        _, want = jax.lax.top_k(lp[0], 10)
        np.testing.assert_array_equal(np.asarray(ids),
                                      np.asarray(want))
        assert all(0 <= i < 60 for i in ids)
        # scores descend
        assert all(a >= b for a, b in zip(scores, scores[1:]))


@pytest.mark.slow
def test_cli_train_then_predict(tmp_path):
    ckpt = tmp_path / "ckpt"
    main(["train", "--model", "niser", "--dataset-dir", "datasets/sample",
          "--epochs", "1", "--max-epoch-batches", "4",
          "--batch-size", "64", "--embedding-dim", "16",
          "--checkpoint-dir", str(ckpt), "--log-interval", "4"])
    out = tmp_path / "recs.jsonl"
    sess_file = tmp_path / "sessions.txt"
    sess_file.write_text("5,9,5\n31,7\n")
    for method in ("exact", "approx"):
        main(["predict", "--model", "niser", "--dataset-dir",
              "datasets/sample", "--embedding-dim", "16",
              "--checkpoint-dir", str(ckpt),
              "--sessions-file", str(sess_file), "--k", "5",
              "--topk-method", method, "--output", str(out)])
        recs = [json.loads(l) for l in out.read_text().splitlines()]
        assert [r["session"] for r in recs] == [[5, 9, 5], [31, 7]]
        for r in recs:
            assert len(r["items"]) == 5 and len(r["scores"]) == 5
            assert all(isinstance(i, int) for i in r["items"])


def test_recommend_rejects_out_of_catalog_ids():
    """Out-of-range item ids must fail loudly (XLA gather would clamp
    them silently and score against the wrong row)."""
    model = NISER(num_items=60, embedding_dim=16, num_layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    for bad in ([[3, 60, 2]], [[1], [2, -1]]):
        with pytest.raises(ValueError, match=f"session {len(bad)}"):
            list(serving.recommend(model, params, state, bad, max_len=6))


def test_lean_restore_without_opt_state(tmp_path):
    """restore_params reads only params+state: it must work from a
    checkpoint that carries no opt_state at all (deleted to save space)
    and never build an optimizer."""
    from sessionrec_tpu.utils.checkpoint import Checkpointer

    model = NISER(num_items=60, embedding_dim=16, num_layers=1)
    params, state = model.init(jax.random.PRNGKey(3))

    ckpt = Checkpointer(tmp_path / "ck")
    ckpt._ckpt.save(ckpt.dir / "epoch_0000",
                    {"params": params, "state": state})
    (ckpt.dir / "epoch_0000.json").write_text("{}")

    got_p, got_s = serving.restore_params(model, tmp_path / "ck")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, got_p)
    assert got_s == state or jax.tree_util.tree_structure(got_s) \
        == jax.tree_util.tree_structure(state)


def test_recommend_msgifsr_multi_head():
    """The REnorm/fusion head serves through the apply path; ids match
    top-k of the fused log-probs."""
    from sessionrec_tpu.models import MSGIFSR
    from sessionrec_tpu.graph.batch import CcsBatch, CcsLevel

    model = MSGIFSR(num_items=50, embedding_dim=16, num_layers=1,
                    order=2, extra=True, fusion=True, feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    sessions = [list(rng.integers(0, 50, size=rng.integers(2, 6)))
                for _ in range(5)]
    got = list(serving.recommend(model, params, state, sessions,
                                 max_len=6, k=7, batch_size=3, order=2))
    assert len(got) == 5
    pp = model.project_params(params)
    for sess, ids, scores in got:
        d = builders.build_ccs_batch([list(sess)], [0], 2, 6, 1)
        batch = CcsBatch(
            levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
            inter_in=tuple(d["inter_in"]), inter_out=tuple(d["inter_out"]),
            labels=d["labels"], valid=d["valid"])
        lp, _ = model.apply(pp, state, batch, training=False, rng=None)
        _, want = jax.lax.top_k(lp[0], 7)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(want))


def test_recommend_msgifsr_streamed_matches_apply():
    """The slab-streamed multi-order serving path (engaged automatically
    at serving-scale catalogs) returns exactly the ids the materialised
    apply path would."""
    from sessionrec_tpu.models import MSGIFSR

    model = MSGIFSR(num_items=50, embedding_dim=16, num_layers=1,
                    order=3, extra=True, fusion=True, feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    sessions = [list(rng.integers(0, 50, size=rng.integers(2, 7)))
                for _ in range(6)]
    kw = dict(max_len=7, k=9, batch_size=3, order=3)
    got_apply = list(serving.recommend(model, params, state, sessions,
                                       streamed=False, **kw))
    got_stream = list(serving.recommend(model, params, state, sessions,
                                        streamed=True, **kw))
    for (s1, ids1, v1), (s2, ids2, v2) in zip(got_apply, got_stream):
        assert s1 == s2
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        # streamed values are raw blended probabilities, the apply path's
        # are their (clamped) logs — same order, different space
        assert all(a >= b for a, b in zip(v2, v2[1:]))
