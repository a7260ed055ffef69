"""Inference / serving: top-k item recommendations from a checkpoint.

The reference has no serving surface — training and metric evaluation
only (src/utils/train.py:36-127; top-k indices are computed and
discarded at train.py:45-53).  This module closes that gap: restore a
trained model from an orbax checkpoint and emit the actual top-k item
ids per session, batched and jitted.

Serving semantics differ from eval on purpose: each input session is
scored ONCE in full (the next-item continuation a recommender actually
serves), not expanded into the per-prefix examples the training
protocol uses (data/augment.py).  Sessions longer than ``max_len`` keep
their most recent items, matching the trainer's ``--max-len`` rule.

Top-k method: ``exact`` is ``lax.top_k`` over the full catalog;
``approx`` is TPU's ``lax.approx_max_k`` (the hardware PartialReduce),
which trades a bounded recall target for a large speedup on
serving-scale catalogs — measured numbers and guidance in
BENCH_NOTES.md (round 4 serving section).  Scores returned are raw
catalog logits (rank-equivalent to the model's log-probabilities:
positive scaling and log_softmax are monotone per row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sessionrec_tpu.graph import builders
from sessionrec_tpu.graph.batch import (CcsBatch, CcsLevel, LessrBatch,
                                        SessionGraphBatch)
from sessionrec_tpu.ops import scoring
from sessionrec_tpu.ops.masked import NEG_INF
from sessionrec_tpu.utils.logging import get_logger

log = get_logger(__name__)

_KIND = {"srgnn": "session", "niser": "session", "lessr": "lessr",
         "msgifsr": "ccs"}


def restore_params(model, checkpoint_dir):
    """(params, state) from the latest checkpoint in ``checkpoint_dir``.

    Restores ONLY the params + model-state subtree
    (utils/checkpoint.py:restore_subtree): the optimizer moments a
    training checkpoint carries — two table-sized f32 tensors — are
    never read, peak restore memory stays ~one table, and serving works
    from a checkpoint whose ``opt_state`` was deleted to save space.
    The template comes from ``jax.eval_shape``, so even the fresh-init
    table is never materialised on the happy path.
    """
    from sessionrec_tpu.utils.checkpoint import Checkpointer

    a_params, a_state = jax.eval_shape(model.init, jax.random.PRNGKey(0))

    def concrete():
        # only reached on shape/dtype drift (old pad_catalog multiple):
        # the migration pads saved rows with real template rows
        params, state = model.init(jax.random.PRNGKey(0))
        return {"params": params, "state": state}

    ckpt = Checkpointer(checkpoint_dir)
    tree = ckpt.restore_subtree({"params": a_params, "state": a_state},
                                concrete_factory=concrete)
    if tree is None:
        raise FileNotFoundError(
            f"no checkpoint found in {checkpoint_dir}")
    return tree["params"], tree["state"]


def session_batches(sessions, kind, batch_size, max_len, order=1):
    """Fixed-shape inference batches: one row per FULL session (no
    prefix augmentation), labels zeroed, tail batch padded invalid."""
    for start in range(0, len(sessions), batch_size):
        chunk = [list(s[-max_len:]) for s in
                 sessions[start:start + batch_size]]
        n = len(chunk)
        chunk += [[0]] * (batch_size - n)
        labels = [0] * batch_size
        if kind == "ccs":
            d = builders.build_ccs_batch(chunk, labels, order, max_len,
                                         batch_size)
            batch = CcsBatch(
                levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                inter_in=tuple(d["inter_in"]),
                inter_out=tuple(d["inter_out"]),
                labels=d["labels"], valid=d["valid"])
        elif kind == "lessr":
            batch = LessrBatch(
                **builders.build_lessr_batch(chunk, labels, max_len,
                                             batch_size))
        else:
            batch = SessionGraphBatch(
                **builders.build_session_batch(chunk, labels, max_len,
                                               batch_size))
        # rows beyond the real sessions are serving padding
        valid = np.zeros(batch_size, np.float32)
        valid[:n] = 1.0
        yield batch.replace(valid=jnp.asarray(valid)), n


def make_recommend_step(model, k=20, method="exact", recall_target=0.95,
                        streamed=None):
    """Jitted (params, state, batch) -> (scores [B, k], item_ids [B, k]).

    Plain-head models score raw masked logits straight from
    ``model.head`` (no full-catalog softmax — rank-equivalent, see
    module docstring).  The multi-order MSGIFSR head scores its fused
    REnorm/fusion blend: via ``model.apply`` while the ``[B, K, P]``
    score tensors fit (materialised is faster at every size that fits —
    same policy as eval, runner._auto_stream), and via the slab-streamed
    two-pass top-k (ops/streamed_eval.py:streamed_multi_topk) above
    that, so the paper configuration serves at million-item catalogs
    without shrinking the batch.  Streamed multi-head scores are raw
    blended probabilities — rank-equivalent to the apply path's
    log-probs; the ids match exactly (tests/test_serving.py).
    ``streamed`` forces the choice (None = auto by score-tensor size);
    ``method="approx"`` applies to the materialised paths only (the
    streamed path's per-slab exact merge is already the fast form at
    the scales that stream).
    """
    def step(params, state, batch):
        params = model.project_params(params)
        if getattr(model, "has_plain_head", False):
            from sessionrec_tpu.models.layers import l2norm
            sr, table, _ = model.head(params, state, batch,
                                      training=False, rng=None)
            if getattr(model, "table_norm", False):
                table = l2norm(table)
            logits = scoring.catalog_logits(sr, table,
                                            compute_dtype=model.cdt)
            imask = scoring.item_mask(model.num_items, model.padded_items)
            scores = jnp.where(imask.astype(bool), logits, NEG_INF)
        elif getattr(model, "has_multi_head", False):
            from sessionrec_tpu.train.runner import _auto_stream
            from sessionrec_tpu.ops.streamed_eval import streamed_multi_topk
            B = batch.labels.shape[0]
            stream = streamed if streamed is not None else _auto_stream(
                B, model.padded_items, getattr(model, "order", 1))
            if stream:
                sr, table, phi, alpha, iids, _ = model.head_multi(
                    params, state, batch, training=False, rng=None)
                # serving slabs are 16x the eval default: the streamed
                # top-k pays a SORT per slab (counting eval does not),
                # so fewer/larger slabs win — measured 3.4x at P=2^20
                # (1,207 -> 4,145 sessions/s going 2048 -> 32768; eval
                # counting is tile-insensitive, BENCH_NOTES r5)
                tile = 32768 if model.padded_items >= 32768 else 2048
                return streamed_multi_topk(
                    sr, table, iids, phi, alpha, num_items=model.num_items,
                    extra=model.extra, fusion=model.fusion, k=k,
                    scale=float(model.scale),
                    normalize_table=getattr(model, "table_norm", False),
                    compute_dtype=model.cdt, tile=tile)
            scores, _ = model.apply(params, state, batch, training=False,
                                    rng=None)
        else:
            scores, _ = model.apply(params, state, batch, training=False,
                                    rng=None)
        if method == "approx":
            return jax.lax.approx_max_k(scores, k,
                                        recall_target=recall_target)
        return jax.lax.top_k(scores, k)

    return jax.jit(step)


def validate_sessions(sessions, num_items):
    """Reject out-of-catalog item ids before they reach the device.

    XLA gather clamps out-of-range indices, so a session carrying an id
    >= num_items (or negative) would silently score against the wrong
    embedding row and return plausible-looking garbage.  Raises naming
    the first offending session (1-based, matching --sessions-file line
    numbers)."""
    for i, s in enumerate(sessions):
        for iid in s:
            if not 0 <= iid < num_items:
                raise ValueError(
                    f"session {i + 1}: item id {iid} is outside the "
                    f"catalog [0, {num_items}) — check that the sessions "
                    f"use the same item-id space as the training dataset")


def recommend(model, params, state, sessions, *, max_len, k=20,
              batch_size=256, method="exact", recall_target=0.95,
              order=1, streamed=None):
    """Yield (session, top-k item ids, scores) for each input session."""
    validate_sessions(sessions, model.num_items)
    step = make_recommend_step(model, k=k, method=method,
                               recall_target=recall_target,
                               streamed=streamed)
    kind = _KIND[type(model).__name__.lower()]
    done = 0
    for batch, n in session_batches(sessions, kind, batch_size, max_len,
                                    order=order):
        vals, ids = step(params, state, batch)
        vals = np.asarray(vals)[:n]
        ids = np.asarray(ids)[:n]
        for i in range(n):
            yield sessions[done + i], ids[i].tolist(), vals[i].tolist()
        done += n
