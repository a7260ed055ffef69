"""TrainRunner — the training loop (reference: src/utils/train.py:56-127).

Differences from the reference are capability additions, not behaviour
changes: the whole step (forward + backward + Adam + max-norm projection)
is one jitted XLA program with donated buffers; metrics and early
stopping reproduce the reference exactly (early stop only when *both*
MRR and HR worsened vs the running maxima, train.py:118-123; running
max-per-metric returned, train.py:124-127; one evaluation before any
training, train.py:91).  Checkpoint/resume is new, flag-gated.
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sessionrec_tpu.ops import scoring, xent
from sessionrec_tpu.train.optim import make_optimizer
from sessionrec_tpu.utils.logging import get_logger

log = get_logger(__name__)


def make_loss_fn(model, state, batch, rng, *, fused=True, mesh=None):
    """Training-loss closure over params.

    When the model's loss is plain softmax-CE over the catalog
    (``has_plain_head``), routes through the fused Pallas kernel
    (ops/xent.py): the ``[B, num_items]`` logits never hit HBM, and the
    catalog-table l2norm (``table_norm``) folds into the same kernel.
    With a ``mesh`` the kernel runs per catalog shard inside shard_map
    (parallel/sharded.py:fused_nll_loss_sharded).  Otherwise (MSGIFSR
    with REnorm/fusion) falls back to the model's full log-prob path
    + nll.
    """
    from sessionrec_tpu.graph.batch import SplitBatch
    if mesh is not None:
        # bind the mesh so embedding gathers use the explicit shard_map
        # lookup (parallel/lookup.py) instead of GSPMD's layout choice
        from sessionrec_tpu.parallel.mesh import with_mesh
        model = with_mesh(model, mesh)
    # Mesh + SplitBatch: join the blocks' rows per data shard instead of
    # letting the model's global concat force GSPMD to replicate the
    # graph-side (parallel/sharded.py:shard_concat_rows).  Training-time
    # BatchNorm needs the model's own joint-moments split path, so LESSR
    # keeps the global concat (correct, mesh-suboptimal — documented).
    split_mesh = (mesh is not None and isinstance(batch, SplitBatch)
                  and not getattr(model, "batch_norm", False))

    if fused and getattr(model, "has_plain_head", False):
        def loss_fn(p):
            kw = dict(scale=float(model.scale) if model.scale else 1.0,
                      num_items=model.num_items,
                      normalize_table=getattr(model, "table_norm", False))
            if mesh is not None:
                from sessionrec_tpu.parallel.sharded import (
                    fused_nll_loss_sharded, split_head_sharded)
                if split_mesh:
                    sr, table, labels, valid, new_state = \
                        split_head_sharded(model, mesh, p, state, batch,
                                           training=True, rng=rng)
                else:
                    sr, table, new_state = model.head(p, state, batch,
                                                      training=True, rng=rng)
                    labels, valid = batch.labels, batch.valid
                loss = fused_nll_loss_sharded(mesh, sr, table, labels,
                                              valid, **kw)
            else:
                sr, table, new_state = model.head(p, state, batch,
                                                  training=True, rng=rng)
                loss = xent.fused_nll_loss(sr, table, batch.labels,
                                           batch.valid, **kw)
            return loss, new_state
        return loss_fn

    if fused and getattr(model, "has_multi_head", False):
        # MSGIFSR with REnorm and/or IFR fusion: fused multi-order loss —
        # neither the [B, P] score tensors nor the session mask exist
        def loss_fn(p):
            kw = dict(scale=float(model.scale), num_items=model.num_items,
                      normalize_table=getattr(model, "table_norm", False),
                      extra=model.extra, fusion=model.fusion)
            if mesh is not None:
                from sessionrec_tpu.parallel.sharded import (
                    fused_multi_loss_sharded, split_head_multi_sharded)
                if split_mesh:
                    (sr, table, phi, alpha, iids, labels, valid,
                     new_state) = split_head_multi_sharded(
                        model, mesh, p, state, batch, training=True,
                        rng=rng)
                else:
                    sr, table, phi, alpha, iids, new_state = \
                        model.head_multi(p, state, batch, training=True,
                                         rng=rng)
                    labels, valid = batch.labels, batch.valid
                loss = fused_multi_loss_sharded(
                    mesh, sr, table, labels, valid, iids, phi,
                    alpha, **kw)
            else:
                sr, table, phi, alpha, iids, new_state = model.head_multi(
                    p, state, batch, training=True, rng=rng)
                from sessionrec_tpu.ops.xent_multi import multi_nll_loss
                loss = multi_nll_loss(sr, table, batch.labels, batch.valid,
                                      iids, phi, alpha, **kw)
            return loss, new_state
        return loss_fn

    def loss_fn(p):
        log_probs, new_state = model.apply(p, state, batch,
                                           training=True, rng=rng)
        loss = scoring.nll_loss(log_probs, batch.labels, batch.valid)
        return loss, new_state
    return loss_fn


def _constrain_params(mesh, params):
    """Pin updated params to their canonical sharding (embedding row-
    sharded over model, replicated over data).  With the ZeRO table
    layout (parallel/sharded.py:_table_grad_layout) the Adam update
    leaves the embedding delta sharded over both axes; this makes the
    data-axis all-gather of the *update* explicit instead of letting XLA
    hand back a differently-sharded table for the next step."""
    if mesh is None:
        return params
    from sessionrec_tpu.parallel.mesh import param_sharding
    return jax.lax.with_sharding_constraint(params,
                                            param_sharding(mesh, params))


def _sharded_bf16_table_update(mesh, model, emb, upd, seed):
    """Per-shard f32 add + max-norm projection + stochastic rounding of
    the bf16 table, inside an explicit shard_map over BOTH mesh axes.

    Left to GSPMD, the round-4 HLO byte counts showed the table-update
    all-gather over ``data`` riding FLOAT32 — the dominant single
    collective of the projected step (19.1 MB at dp=8/mp=2) — because
    the rounding was scheduled after the gather.  Making the
    update+renorm+round explicitly (model, data)-sharded pins the
    rounding BEFORE the gather, so ``_constrain_params``'s data-axis
    all-gather of the updated table moves bf16 — half the bytes
    (tests/test_zero_opt.py:test_bf16_table_allgather_bytes).

    The SR seed folds the linear shard id in, so shards draw independent
    masks (ops/sround hashes LOCAL flat indices inside shard_map);
    draws stay a pure function of the checkpointed step key, so resume
    replays identical rounding.  The in-shard projection mirrors
    ``model.project_params`` exactly: all four models' projection is
    row-wise table renorm iff ``model.has_max_norm`` (models/lessr.py,
    models/msgifsr.py) — row-wise, so per-shard application is the
    identity-equal split of the global one.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from sessionrec_tpu.ops.sround import (bf16_from_bits,
                                           stochastic_round_bf16_bits)
    from sessionrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    has_max_norm = getattr(model, "has_max_norm", False)
    dp = mesh.shape[DATA_AXIS]

    def local(emb_l, upd_l):
        # emb arrives at its canonical P(model, None) sharding (each
        # device holds the model shard's full rows) and the data-chunk
        # is sliced HERE — demanding P((model, data)) on the table at
        # the shard_map boundary instead made GSPMD collapse the scan
        # carry to that sharding, breaking the params' canonical-
        # sharding invariant across chunks
        didx = jax.lax.axis_index(DATA_AXIS)
        rows = upd_l.shape[0]
        emb_slice = jax.lax.dynamic_slice_in_dim(emb_l, didx * rows, rows)
        new = emb_slice.astype(jnp.float32) + upd_l.astype(jnp.float32)
        if has_max_norm:
            from sessionrec_tpu.models.lessr import renorm_rows
            new = renorm_rows(new, 1.0)
        sid = (jax.lax.axis_index(MODEL_AXIS) * dp + didx).astype(jnp.int32)
        # gather the rounded table as its uint16 BIT PATTERNS: gathering
        # bf16 values kept losing to XLA rescheduling the f32->bf16
        # convert past the collective (even explicit + barrier'd), which
        # re-widened the wire to f32 — integer bits leave nothing to
        # hoist (ops/sround.py:stochastic_round_bf16_bits)
        bits = stochastic_round_bf16_bits(new, seed + sid * 0x27D4EB2F)
        return bf16_from_bits(
            jax.lax.all_gather(bits, DATA_AXIS, axis=0, tiled=True))

    return shard_map(local, mesh=mesh,
                     in_specs=(P(MODEL_AXIS, None),
                               P((MODEL_AXIS, DATA_AXIS), None)),
                     out_specs=P(MODEL_AXIS, None), check_vma=False)(emb, upd)


def _apply_updates_project(model, params, updates, rng, mesh=None):
    """``optax.apply_updates`` + max-norm projection, with unbiased
    stochastic rounding when the embedding table is stored bfloat16.

    A round-to-nearest ``p + u`` stalls for bf16 tables once
    ``|u| < 2^-9 |p|`` (every update after the first StepLR decay); so
    for bf16 tables the add and the max-norm projection run in float32
    and the result rounds back with ops/sround.py — E[table'] equals the
    f32 trajectory.  The SR seed folds out of the step's PRNG key, so
    resume-from-checkpoint replays identical rounding decisions.  Under
    a mesh the whole table update runs per shard so the table's
    data-axis all-gather moves bf16 (``_sharded_bf16_table_update``).
    """
    new_params = optax.apply_updates(params, updates)
    emb = params.get("embedding") if isinstance(params, dict) else None
    if emb is not None and emb.dtype == jnp.bfloat16:
        from sessionrec_tpu.ops.sround import stochastic_round_bf16
        seed = jax.random.key_data(jax.random.fold_in(rng, 0x5EED)) \
            .ravel()[-1].astype(jnp.int32)
        if mesh is not None:
            from sessionrec_tpu.parallel.sharded import _table_grad_layout
            scatter, _ = _table_grad_layout(mesh, emb)
            if scatter:
                # project_params only ever touches the embedding (all
                # four models), which the shard_map projects in-shard —
                # the other leaves are final after apply_updates
                new_params["embedding"] = _sharded_bf16_table_update(
                    mesh, model, emb, updates["embedding"], seed)
                return new_params
        new_params["embedding"] = (emb.astype(jnp.float32)
                                   + updates["embedding"]
                                   .astype(jnp.float32))
        new_params = model.project_params(new_params)
        new_params["embedding"] = stochastic_round_bf16(
            new_params["embedding"], seed)
        return new_params
    return model.project_params(new_params)


def make_train_step(model, tx, *, fused=True, mesh=None):
    """Build the jitted train step: fwd -> bwd -> Adam -> project.

    Invariant: the step *expects* max-norm-projected params and *returns*
    projected params.  Gradients are therefore always taken at a
    projected table (torch's lookup-time ``max_norm`` semantics — see
    models/lessr.py), but the projection runs at the END of the step,
    adjacent to ``apply_updates``, where XLA fuses the row-renorm into
    the optimizer's table pass — one HBM read+write of the full table
    per step instead of two.  ``TrainRunner`` projects once at init to
    establish the invariant (fresh U(-1/sqrt d) inits are already inside
    the norm ball, so that projection is the identity).
    """
    def train_step(params, state, opt_state, batch, rng):
        loss_fn = make_loss_fn(model, state, batch, rng, fused=fused,
                               mesh=mesh)
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = _apply_updates_project(model, params, updates, rng,
                                        mesh=mesh)
        params = _constrain_params(mesh, params)
        return params, new_state, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def make_unrolled_train_step(model, tx, unroll: int, *, fused=True,
                             mesh=None, assume_valid=False):
    """Device-side training loop: one jitted call runs ``unroll``
    sequential optimizer steps via ``lax.scan`` over a stacked chunk of
    batches.

    Per-step host dispatch is the single-chip bottleneck (the compiled
    step itself is ~10x faster than one Python dispatch round-trip), so
    the input pipeline stacks G batches into one ``[G, ...]`` pytree and
    the whole chunk runs as one XLA program — the TPU-native equivalent
    of the reference's DataLoader+step loop (train.py:94-101), with
    identical math and batch order.

    A chunk's tail may be padded with all-invalid batches (epoch end);
    those steps are skipped entirely under ``lax.cond`` so weight decay
    and the LR schedule's step count see exactly the real batches.
    ``assume_valid=True`` compiles without the cond for chunks the
    caller guarantees contain no padded batches (every chunk but an
    epoch's last) — identical math on such chunks.
    """
    def one_step(carry, xs):
        params, state, opt_state = carry
        batch, rng = xs

        def do(operand):
            # same projected-params invariant as make_train_step: grads at
            # the projected table, renorm fused into the update pass
            params, state, opt_state = operand
            loss_fn = make_loss_fn(model, state, batch, rng, fused=fused,
                                   mesh=mesh)
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = _apply_updates_project(model, params, updates,
                                            rng, mesh=mesh)
            params = _constrain_params(mesh, params)
            return (params, new_state, opt_state), loss

        def skip(operand):
            return operand, jnp.float32(0.0)

        if assume_valid:
            return do((params, state, opt_state))
        has_valid = jnp.sum(batch.valid) > 0
        carry, loss = jax.lax.cond(has_valid, do, skip,
                                   (params, state, opt_state))
        return carry, loss

    def multi_step(params, state, opt_state, batches, rngs):
        (params, state, opt_state), losses = jax.lax.scan(
            one_step, (params, state, opt_state), (batches, rngs))
        return params, state, opt_state, losses

    return jax.jit(multi_step, donate_argnums=(0, 1, 2))


# Auto-streaming threshold: materialise [B, P] logits while they fit.
# Measured on TPU v5e: the materialised path wins at every size that
# fits — 4.3x at yoochoose-1/4 scale (3.6 vs 15.1 ms/eval batch,
# scripts/probe_eval.py) and 1.4x at the P=2^20 design point with
# counting ranks on both sides (8.3 vs 11.7 ms/batch, round 4) — so
# streaming remains an out-of-memory escape hatch: engage it only when
# the [B, P] logits tensor would claim a significant fraction of a v5e
# chip's 16 GB HBM (4 GB f32 threshold; eval runs alongside the
# resident table + Adam moments).  The hatch itself is no longer a
# cliff: counting ranks (streamed_count_ranks) replaced the per-slab
# top-k merges on the plain-head streamed path, taking it from 354 to
# 11.7 ms/batch at P=2^20.
_STREAM_EVAL_ELEMS = 1024 * 1024 * 1024


def _auto_stream(batch_size: int, padded_items: int,
                 score_rows: int = 1) -> bool:
    """True when eval should stream instead of materialising the score
    tensor (see _STREAM_EVAL_ELEMS — an OOM escape hatch, never a speed
    optimisation; materialised measured faster at every size that
    fits, including B=512 x P=2^20).  ``score_rows`` is the per-example
    score-tensor multiplier: K for MSGIFSR's multi-order ``[B, K, P]``
    logits (its REnorm/fusion apply also materialises per-split softmax
    tensors of the same size, so K understates the true footprint —
    conservatively correct for the threshold's purpose)."""
    return batch_size * score_rows * padded_items >= _STREAM_EVAL_ELEMS


# Default rank method for the materialised eval path: counting
# (ops/scoring.py:label_ranks_by_count — bit-identical ranks, no sort).
# Measured on TPU v5e with the unrolled eval harness
# (scripts/probe_rank.py): counting beats the catalog-sized lax.top_k
# at BOTH measured scales — msgifsr-o1 (B=512, P=37.9k) 3.40 ->
# 1.98 ms/eval-batch and niser-1m (B=512, P=2^20) 45.0 -> 17.7 — so
# auto always counts; "topk" stays available as an explicit A/B knob.
# The resolution predicate is shared with the mesh eval path:
# ops/scoring.py:use_count_ranks (validates the method string).


def _eval_ranks(model, params, state, batch, cutoff, streamed=None,
                rank_method=None):
    """Label ranks for one eval batch.

    ``streamed``: None (default) auto-selects — the materialised
    log-probs path below ``_STREAM_EVAL_ELEMS`` logits elements, the
    slab-streamed path (ops/streamed_eval.py) above it, where the
    ``[B, P]`` tensor the reference materialises at train.py:45-53
    stops fitting comfortably.  Both paths produce identical ranks
    (tests/test_streamed_eval.py).

    ``rank_method``: "topk" | "count" | None (auto = count, see
    ``_use_count_ranks``) — how the ``[B, P]`` scores become label
    ranks.  Both methods return identical ranks on any input
    (tests/test_ops.py); "count" skips the catalog-sized ``lax.top_k``
    sort, which dominates eval wall-clock at serving-scale catalogs.
    """
    if streamed is None:
        streamed = _auto_stream(
            batch.labels.shape[0], getattr(model, "padded_items", 0),
            getattr(model, "order", 1)
            if getattr(model, "has_multi_head", False) else 1)
    if streamed and getattr(model, "has_plain_head", False):
        from sessionrec_tpu.ops.streamed_eval import (streamed_count_ranks,
                                                      streamed_topk_ranks)
        sr, table, _ = model.head(params, state, batch, training=False,
                                  rng=None)
        if scoring.use_count_ranks(rank_method):
            return streamed_count_ranks(
                sr, table, batch.labels, num_items=model.num_items, k=cutoff,
                normalize_table=getattr(model, "table_norm", False),
                compute_dtype=model.cdt)
        return streamed_topk_ranks(
            sr, table, batch.labels, num_items=model.num_items, k=cutoff,
            scale=float(model.scale) if model.scale else 1.0,
            normalize_table=getattr(model, "table_norm", False),
            compute_dtype=model.cdt)
    if streamed and getattr(model, "has_multi_head", False):
        from sessionrec_tpu.ops.streamed_eval import (
            streamed_multi_count_ranks, streamed_multi_topk_ranks)
        sr, table, phi, alpha, iids, _ = model.head_multi(
            params, state, batch, training=False, rng=None)
        fn = (streamed_multi_count_ranks
              if scoring.use_count_ranks(rank_method)
              else streamed_multi_topk_ranks)
        return fn(
            sr, table, batch.labels, iids, phi, alpha,
            num_items=model.num_items, extra=model.extra,
            fusion=model.fusion, k=cutoff, scale=float(model.scale),
            normalize_table=getattr(model, "table_norm", False),
            compute_dtype=model.cdt)
    if getattr(model, "has_plain_head", False):
        # Rank on raw masked logits: the plain-head ``apply`` is exactly
        # ``log_softmax(mask(scale * sr @ tableT))`` (e.g. niser.py
        # apply), and positive scaling + log_softmax are strictly
        # monotone per row and tie-preserving, so label ranks are
        # unchanged — the full-catalog softmax passes (2 extra
        # reads+writes of the [B, P] tensor, dominant at serving-scale
        # P) are skipped (tests/test_runner_unroll.py asserts metric
        # equality with the apply path).
        from sessionrec_tpu.models.layers import l2norm
        sr, table, _ = model.head(params, state, batch, training=False,
                                  rng=None)
        if getattr(model, "table_norm", False):
            table = l2norm(table)
        logits = scoring.catalog_logits(sr, table, compute_dtype=model.cdt)
        imask = scoring.item_mask(model.num_items, model.padded_items)
        scores = jnp.where(imask.astype(bool), logits,
                           jnp.float32(-jnp.inf))
    else:
        scores, _ = model.apply(params, state, batch, training=False,
                                rng=None)
    if scoring.use_count_ranks(rank_method):
        return scoring.label_ranks_by_count(scores, batch.labels, cutoff)
    return scoring.topk_ranks(scores, batch.labels, cutoff)


def make_eval_step(model, cutoff=20, streamed=None, rank_method=None):
    """Jitted eval step -> (hit_count, mrr_sum, num_valid) per batch."""

    def eval_step(params, state, batch):
        params = model.project_params(params)
        ranks = _eval_ranks(model, params, state, batch, cutoff, streamed,
                            rank_method)
        v = batch.valid
        hit = jnp.sum((ranks > 0) * v)
        mrr = jnp.sum(jnp.where(ranks > 0, 1.0 / jnp.maximum(ranks, 1), 0.0)
                      * v)
        return hit, mrr, jnp.sum(v)

    return jax.jit(eval_step)


def make_unrolled_eval_step(model, cutoff=20, project=True,
                            streamed=None, rank_method=None):
    """Jitted scan over a stacked chunk of eval batches -> summed
    (hit_count, mrr_sum, num_valid).  Padded all-invalid batches
    contribute zero.  ``project=False`` when the caller pre-projects the
    params once per evaluation sweep (TrainRunner does) instead of
    re-running the table renorm every chunk."""

    def eval_chunk(params, state, batches):
        if project:
            params = model.project_params(params)

        def one(carry, batch):
            ranks = _eval_ranks(model, params, state, batch, cutoff,
                                streamed, rank_method)
            v = batch.valid
            hit = jnp.sum((ranks > 0) * v)
            mrr = jnp.sum(jnp.where(ranks > 0,
                                    1.0 / jnp.maximum(ranks, 1), 0.0) * v)
            h, m, n = carry
            return (h + hit, m + mrr, n + jnp.sum(v)), None

        zero = jnp.float32(0.0)
        (h, m, n), _ = jax.lax.scan(one, (zero, zero, zero), batches)
        return h, m, n

    return jax.jit(eval_chunk)


def stack_batches(chunk, pad_to: int):
    """Stack a list of batch pytrees into one [G, ...] pytree, padding the
    tail with all-invalid zero batches to the static chunk size."""
    if len(chunk) < pad_to:
        zero = jax.tree_util.tree_map(lambda x: np.zeros_like(np.asarray(x)),
                                      chunk[0])
        chunk = list(chunk) + [zero] * (pad_to - len(chunk))
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *chunk)


def _chunks(iterable, size: int):
    buf = []
    for item in iterable:
        buf.append(item)
        if len(buf) == size:
            yield buf
            buf = []
    if buf:
        yield buf


def evaluate(eval_chunk_step, params, state, loader, unroll: int = 8,
             place=None):
    """HR@cutoff / MRR@cutoff over a loader (reference: train.py:36-55)."""
    hit = mrr = n = 0.0
    for chunk in _chunks(loader, unroll):
        stacked = stack_batches(chunk, unroll)
        if place is not None:
            stacked = place(stacked)
        h, m, c = eval_chunk_step(params, state, stacked)
        hit += float(h)
        mrr += float(m)
        n += float(c)
    n = max(n, 1.0)
    return mrr / n, hit / n


class TrainRunner:
    """Training loop.  With ``mesh`` (a (data, model) ``jax.sharding.Mesh``)
    the same pure step functions run GSPMD-sharded: the embedding table is
    row-sharded over ``model``, batches are sharded over ``data``, and
    evaluation merges per-shard top-k candidates (parallel/sharded.py).
    """

    def __init__(self, model, train_loader, test_loader, *, lr=1e-3,
                 weight_decay=1e-4, patience=3, seed=123, cutoff=20,
                 lr_step_size=3, lr_gamma=0.1, eval_before_train=True,
                 checkpointer=None, checkpoint_every=1, unroll=8, fused=True,
                 mesh=None, metrics=None):
        self.model = model
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.patience = patience
        self.cutoff = cutoff
        self.eval_before_train = eval_before_train
        self.checkpointer = checkpointer
        self.checkpoint_every = max(int(checkpoint_every), 1)
        self.unroll = max(int(unroll), 1)
        self.mesh = mesh
        self.metrics = metrics

        key = jax.random.PRNGKey(seed)
        self.init_key, self.step_key = jax.random.split(key)
        self.params, self.state = model.init(self.init_key)
        # establish the train-step invariant (params enter every step
        # already max-norm-projected); identity for fresh inits
        self._project_jit = jax.jit(model.project_params)
        self.params = self._project_jit(self.params)
        self.tx = make_optimizer(self.params, lr, weight_decay,
                                 steps_per_epoch=len(train_loader),
                                 lr_step_size=lr_step_size, lr_gamma=lr_gamma)
        if mesh is not None:
            from sessionrec_tpu.parallel.mesh import replicated
            from sessionrec_tpu.parallel.sharded import (
                init_opt_state, make_sharded_unrolled_eval_step,
                place_params)
            self.params = place_params(mesh, self.params)
            self.state = jax.device_put(self.state,
                                        replicated(mesh, self.state))
            # ZeRO layout: the table's Adam moments shard over both axes
            self.opt_state = init_opt_state(mesh, self.tx, self.params)
            self.eval_step = make_sharded_unrolled_eval_step(
                model, mesh, cutoff, project=False)
        else:
            self.opt_state = self.tx.init(self.params)
            self.eval_step = make_unrolled_eval_step(model, cutoff,
                                                     project=False)
        # full chunks (every batch real) compile without the per-step
        # pad-skip lax.cond — measured +5% step time on TPU v5e; the
        # guarded variant compiles lazily, only if an epoch ends in a
        # partial chunk.  A real batch always has >= 1 valid example, so
        # the cond always took the do() branch on full chunks anyway.
        self.train_step = make_unrolled_train_step(model, self.tx,
                                                   self.unroll, fused=fused,
                                                   mesh=mesh,
                                                   assume_valid=True)
        self.train_step_guarded = make_unrolled_train_step(
            model, self.tx, self.unroll, fused=fused, mesh=mesh)
        self.epoch = 0
        self.batch = 0
        # early-stop bookkeeping lives on the runner (not train() locals)
        # so checkpoint/resume reproduces an uninterrupted run exactly
        self.max_mrr = 0.0
        self.max_hit = 0.0
        self.bad_counter = 0

    def _place(self, stacked):
        """Place a stacked [G, B, ...] chunk with data-axis sharding.

        Multi-process: each host holds only its local rows of every
        global batch (loader ``batch_slice``); the global array is
        assembled device-side without any host materialising the full
        batch (parallel/multihost.py)."""
        if self.mesh is None:
            return stacked
        if jax.process_count() > 1:
            from sessionrec_tpu.parallel.multihost import place_chunk
            return place_chunk(self.mesh, stacked)
        from sessionrec_tpu.parallel.mesh import chunk_sharding
        return jax.device_put(stacked, chunk_sharding(self.mesh, stacked))

    def evaluate(self):
        # params are kept projected by the train-step invariant; this
        # once-per-sweep projection only covers externally loaded params
        # (e.g. checkpoints written by older builds) — the eval steps are
        # built with project=False
        params = self._project_jit(self.params)
        return evaluate(self.eval_step, params, self.state,
                        self.test_loader, unroll=self.unroll,
                        place=self._place)

    def _drain_losses(self, pending):
        """Sum pending device-side losses -> mean; abort on non-finite.

        The reference asserts no-NaN on every batch's scores
        (train.py:98); checking here — at log intervals and epoch ends,
        where the losses are pulled to host anyway — gives the same
        abort-on-divergence guarantee without forcing a device sync on
        every step."""
        n_real = sum(r for _, r in pending)
        total = float(sum(float(jnp.sum(l)) for l, _ in pending))
        if not math.isfinite(total):
            raise FloatingPointError(
                f"non-finite training loss at batch {self.batch} "
                f"(epoch {self.epoch}) — aborting (parity with the "
                "reference's per-batch NaN assert, train.py:98)")
        return total / max(n_real, 1)

    def train(self, epochs, log_interval=100):
        t = time.time()
        interval_examples = 0
        interval_batches = 0

        if self.eval_before_train:
            mrr, hit = self.evaluate()
            log.info("initial eval: MRR = %.3f%%, Hit = %.3f%%",
                     mrr * 100, hit * 100)

        while self.epoch < epochs:
            epoch_t = time.time()
            epoch_examples = 0
            pending_losses = []
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(self.epoch)
            for chunk in _chunks(self.train_loader, self.unroll):
                real = len(chunk)
                batches = self._place(stack_batches(chunk, self.unroll))
                self.step_key, sub = jax.random.split(self.step_key)
                rngs = jax.random.split(sub, self.unroll)
                step = self.train_step if real == self.unroll \
                    else self.train_step_guarded
                (self.params, self.state, self.opt_state,
                 loss) = step(self.params, self.state,
                              self.opt_state, batches, rngs)
                # keep losses as device arrays — converting per chunk would
                # force a host sync and serialise dispatch with compute
                pending_losses.append((loss, real))
                bsz = int(sum(np.sum(np.asarray(b.valid)) for b in chunk))
                interval_examples += bsz
                epoch_examples += bsz
                interval_batches += real
                self.batch += real
                if interval_batches >= log_interval:
                    mean_loss = self._drain_losses(pending_losses)
                    pending_losses = []
                    dt = time.time() - t
                    log.info(
                        "batch %d: loss = %.4f, %.1f examples/s, %.2fs",
                        self.batch, mean_loss,
                        interval_examples / max(dt, 1e-9), dt)
                    if self.metrics is not None:
                        self.metrics.log(
                            "train", step=self.batch, epoch=self.epoch,
                            loss=mean_loss,
                            examples_per_s=interval_examples / max(dt, 1e-9))
                    t = time.time()
                    interval_examples = 0
                    interval_batches = 0
            if pending_losses:
                self._drain_losses(pending_losses)

            mrr, hit = self.evaluate()
            log.info("epoch %d: MRR = %.3f%%, Hit = %.3f%% "
                     "(%.1f train examples/s)",
                     self.epoch, mrr * 100, hit * 100,
                     epoch_examples / max(time.time() - epoch_t, 1e-9))
            if self.metrics is not None:
                self.metrics.log(
                    "eval", step=self.batch, epoch=self.epoch, mrr=mrr,
                    hit=hit,
                    examples_per_s=epoch_examples
                    / max(time.time() - epoch_t, 1e-9))

            # early stop only when BOTH metrics worsened (train.py:118-123)
            stop = False
            if mrr < self.max_mrr and hit < self.max_hit:
                self.bad_counter += 1
                stop = self.bad_counter == self.patience
            else:
                self.bad_counter = 0
            self.max_mrr = max(self.max_mrr, mrr)
            self.max_hit = max(self.max_hit, hit)

            if self.checkpointer is not None and (
                    stop or (self.epoch + 1) % self.checkpoint_every == 0):
                self.checkpointer.save(self.epoch, self, metrics={
                    "mrr": mrr, "hit": hit})

            self.epoch += 1
            if stop:
                break
        return self.max_mrr, self.max_hit
