"""Streamed full-catalog eval ranking — the [B, P] logits never exist.

Training already streams the catalog through the fused CE kernels
(ops/xent.py / ops/xent_multi.py); evaluation materialises
``log_softmax(sr @ table^T)`` — ~77 MB per eval batch at yoochoose-1/4
scale — only to take its top-20 (reference: train.py:45-53).  This
module computes exactly the same label ranks while walking the catalog
in ``[TILE, D]`` slabs under ``lax.scan``: per slab the logits tile is
reduced to its local top-k and merged into a running candidate set, so
peak memory is ``[B, TILE]``.

Role (measured, scripts/probe_eval.py / probe_rank.py on TPU v5e): the
materialised path is faster at every size that fits (4.3x at
yoochoose-1/4 scale; 1.4x at B=512 x P=2^20 once both sides rank by
counting), so streaming engages only when the ``[B, P]`` logits tensor
itself becomes the problem (runner auto-switches above ~1G logits
elements — a >4 GB f32 tensor next to the resident table + moments).
On the plain head the hatch ranks by COUNTING (streamed_count_ranks,
11.7 ms/batch at P=2^20) — the top-k-merge form below (354 ms/batch
there: thousands of sequential per-slab sorts) remains as the explicit
rank_method="topk" A/B path and the template for the multi-order head.

Written as plain XLA (scan + dot + top_k) rather than a Pallas kernel
on purpose: the slab matmul already runs at MXU speed, `lax.top_k` over
a slab is tiny, and XLA fuses the masking/softmax arithmetic into the
matmul epilogue — a custom kernel would add Mosaic risk for no
roofline headroom (cf. the fused-GAT postmortem in BENCH_NOTES.md).

Tie semantics match the materialised path exactly: ``lax.top_k`` is
stable (lowest index first), per-slab candidates inherit that, and the
merge concatenates earlier (lower-index) candidates before later ones,
so equal scores resolve to the lowest global index — identical to one
global ``lax.top_k``.

The multi-order path replicates MSGIFSR's REnorm/fusion scoring
(msgifsr.py:283-317, scoring.masked_catalog_softmax): one streaming
pass accumulates the per-(example, order, split) online max / sum-exp,
a second pass forms the blended scores slab by slab and merges top-k.
Ranks are computed on the raw blended score — the materialised path's
final ``log(clamp(score, 1e-30))`` is monotonic above the clamp, and a
top-20 score below 1e-30 cannot occur (the max softmax entry is
>= 1/P).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sessionrec_tpu.ops.masked import NEG_INF

TILE = 2048


def _l2norm_f32(x, eps=1e-12):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps).astype(x.dtype)


def _pad_table(table, tile):
    P = table.shape[0]
    pad = (-P) % tile
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, table.shape[1]), table.dtype)], 0)
    return table, P + pad


def _merge_topk(vals, idxs, tv, ti, k):
    """Merge running candidates with a slab's top-k.  Running candidates
    (earlier slabs = lower global indices) are concatenated FIRST so
    stable top_k keeps lowest-index winners on ties."""
    mv, mpos = jax.lax.top_k(jnp.concatenate([vals, tv], axis=1), k)
    midx = jnp.take_along_axis(jnp.concatenate([idxs, ti], axis=1), mpos,
                               axis=1)
    return mv, midx


def _ranks_of(labels, idxs, vals):
    hit = (idxs == labels[:, None]) & (vals > NEG_INF * 0.5)
    rank = jnp.argmax(hit, axis=-1) + 1
    return jnp.where(jnp.any(hit, axis=-1), rank, 0)


def streamed_topk_ranks(sr, table, labels, *, num_items, k=20, scale=1.0,
                        normalize_table=False, compute_dtype=None,
                        tile=TILE):
    """Label ranks (1-based within top-k, else 0) for the plain head:
    ``rank within top_k(scale * sr @ norm?(table)^T)``.  Equals
    ``scoring.topk_ranks(model.apply(...))`` for every plain-head model
    (log_softmax is rank-preserving)."""
    B = sr.shape[0]
    table, P = _pad_table(table, tile)
    n_tiles = P // tile
    sr_c = sr.astype(compute_dtype) if compute_dtype is not None else sr

    def body(carry, i):
        vals, idxs = carry
        tab = jax.lax.dynamic_slice_in_dim(table, i * tile, tile)
        if normalize_table:
            tab = _l2norm_f32(tab)
        tab_c = tab.astype(compute_dtype) if compute_dtype is not None \
            else tab
        lo = scale * jax.lax.dot_general(
            sr_c, tab_c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [B, T]
        col = i * tile + jnp.arange(tile)
        lo = jnp.where(col[None, :] < num_items, lo, NEG_INF)
        tv, ti = jax.lax.top_k(lo, k)
        carry = _merge_topk(vals, idxs, tv, ti + i * tile, k)
        return carry, None

    init = (jnp.full((B, k), NEG_INF, jnp.float32),
            jnp.zeros((B, k), jnp.int32))
    (vals, idxs), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return _ranks_of(labels, idxs, vals)


def streamed_count_ranks(sr, table, labels, *, num_items, k=20,
                         normalize_table=False, compute_dtype=None,
                         tile=TILE, col_offset=0, n_valid=None,
                         axis_name=None):
    """``scoring.label_ranks_by_count`` without the ``[B, P]`` tensor.

    Plain-head streamed ranking by counting (see
    scoring.label_ranks_by_count for the tie argument): pass 1 walks the
    catalog slabs only to pluck each label's own logit **from the slab
    matmul itself** — a separate row-gathered dot product could differ
    in the last ulp (different accumulation pattern) and break the
    exact-tie comparison against the label's own column; pass 2 walks
    the slabs again accumulating ``#{j : s_j > s_label}`` and the
    stable-tie term.  No per-slab top-k merges at all — the reductions
    fuse into the slab matmul's epilogue, so each pass runs at the
    table-read floor (measured vs the merge-based streamed path in
    scripts/probe_rank.py).

    Mesh form (parallel/sharded.py:sharded_head_count_ranks calls this
    inside a shard_map): ``table`` is one catalog shard's rows,
    ``col_offset`` its global row offset, ``n_valid`` the count of its
    rows that are real items, and ``axis_name`` the catalog axis — the
    label logit and the two counters then merge with three tiny [B]
    ``psum``s (the label's own score is one bitwise-exact contribution
    plus zeros, so ties still resolve exactly).
    """
    B = sr.shape[0]
    table, P = _pad_table(table, tile)
    n_tiles = P // tile
    sr_c = sr.astype(compute_dtype) if compute_dtype is not None else sr
    labels = labels.astype(jnp.int32)
    if n_valid is None:
        n_valid = num_items

    def slab_logits(i):
        tab = jax.lax.dynamic_slice_in_dim(table, i * tile, tile)
        if normalize_table:
            tab = _l2norm_f32(tab)
        tab_c = tab.astype(compute_dtype) if compute_dtype is not None \
            else tab
        lo = jax.lax.dot_general(
            sr_c, tab_c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [B, T]
        local_col = i * tile + jnp.arange(tile)
        lo = jnp.where(local_col[None, :] < n_valid, lo, NEG_INF)
        return lo, local_col + col_offset                  # global col ids

    def lv_body(carry, i):
        lo, _ = slab_logits(i)
        local = labels - col_offset - i * tile
        present = (local >= 0) & (local < tile)
        got = jnp.take_along_axis(
            lo, jnp.clip(local, 0, tile - 1)[:, None], axis=1)[:, 0]
        return jnp.where(present, got, carry), None

    lv, _ = jax.lax.scan(lv_body, jnp.full((B,), NEG_INF, jnp.float32),
                         jnp.arange(n_tiles))
    if axis_name is not None:
        owned = (labels >= col_offset) & (labels - col_offset < n_valid)
        lv = jax.lax.psum(jnp.where(owned, lv, 0.0), axis_name)

    def count_body(carry, i):
        gt, eq = carry
        lo, col = slab_logits(i)
        gt = gt + jnp.sum((lo > lv[:, None]).astype(jnp.int32), axis=1)
        eq = eq + jnp.sum(((lo == lv[:, None])
                           & (col[None, :] < labels[:, None]))
                          .astype(jnp.int32), axis=1)
        return (gt, eq), None

    zeros = jnp.zeros((B,), jnp.int32)
    (gt, eq), _ = jax.lax.scan(count_body, (zeros, zeros),
                               jnp.arange(n_tiles))
    if axis_name is not None:
        gt = jax.lax.psum(gt, axis_name)
        eq = jax.lax.psum(eq, axis_name)
    rank = gt + eq + 1
    return jnp.where(rank <= k, rank, 0)


def _multi_ctx(sr, table, iids, phi, alpha, *, num_items, extra, fusion,
               scale, normalize_table, compute_dtype, tile,
               col_offset=0, n_valid=None, axis_name=None):
    """Shared machinery of the multi-order streamed rankers: slab logits,
    REnorm part masks, the two-part LSE stats pass, and the per-slab
    blended-score function (identical float ops in every caller, so the
    counting ranker's label score is bitwise the score pass-2 computes
    at that column).

    With ``axis_name`` (mesh; see streamed_count_ranks) the table is one
    catalog shard, the pass-1 (max, sum-exp) stats merge across shards
    with a ``pmax`` + rescaled ``psum`` per (example, order, part) —
    exactly the fused training loss's stat merge
    (parallel/sharded.py:_merge_partial_lse) — and ``fused_score`` then
    blends every shard's columns against the same global denominators.
    """
    B, K, _ = sr.shape
    table, P = _pad_table(table, tile)
    n_tiles = P // tile
    sr_c = sr.astype(compute_dtype) if compute_dtype is not None else sr
    n_parts = 2 if extra else 1
    if n_valid is None:
        n_valid = num_items

    def slab_logits(i):
        tab = jax.lax.dynamic_slice_in_dim(table, i * tile, tile)
        if normalize_table:
            tab = _l2norm_f32(tab)
        tab_c = tab.astype(compute_dtype) if compute_dtype is not None \
            else tab
        lo = scale * jax.lax.dot_general(
            sr_c, tab_c, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [B, K, T]
        local_col = i * tile + jnp.arange(tile)
        col = local_col + col_offset                       # global ids
        imask = (local_col < n_valid)[None, :]             # [1, T]
        return lo, col, imask

    def part_masks(col, imask):
        """[B, T] masks per part: (in-session, out-of-session) when
        ``extra`` else (all real items,)."""
        if not extra:
            return (jnp.broadcast_to(imask, (B, col.shape[0])),)
        ins = jnp.any(iids[:, :, None] == col[None, None, :], axis=1)
        return (ins & imask, (~ins) & imask)

    # pass 1: online max / sum-exp per (example, order, part)
    def lse_body(carry, i):
        ms, ss = carry                                     # [parts, B, K]
        lo, col, imask = slab_logits(i)
        new_ms, new_ss = [], []
        for p_i, pmask in enumerate(part_masks(col, imask)):
            x = jnp.where(pmask[:, None, :], lo, NEG_INF)  # [B, K, T]
            m_tile = jnp.max(x, axis=-1)
            m_new = jnp.maximum(ms[p_i], m_tile)
            # guard exp under all-masked rows (m_new = NEG_INF)
            m_safe = jnp.maximum(m_new, NEG_INF * 0.5)
            ex = jnp.where(pmask[:, None, :],
                           jnp.exp(x - m_safe[..., None]), 0.0)
            s_new = ss[p_i] * jnp.exp(
                jnp.maximum(ms[p_i], NEG_INF * 0.5) - m_safe) \
                + jnp.sum(ex, axis=-1)
            new_ms.append(m_new)
            new_ss.append(s_new)
        return (jnp.stack(new_ms), jnp.stack(new_ss)), None

    init = (jnp.full((n_parts, B, K), NEG_INF, jnp.float32),
            jnp.zeros((n_parts, B, K), jnp.float32))
    (ms, ss), _ = jax.lax.scan(lse_body, init, jnp.arange(n_tiles))
    if axis_name is not None:
        # merge per-shard (max, relative sum-exp) across catalog shards
        m_g = jax.lax.pmax(ms, axis_name)
        m_g_safe = jnp.maximum(m_g, NEG_INF * 0.5)
        ss = jax.lax.psum(
            ss * jnp.exp(jnp.maximum(ms, NEG_INF * 0.5) - m_g_safe),
            axis_name)
        ms = m_g
    m_safe = jnp.maximum(ms, NEG_INF * 0.5)                # [parts, B, K]
    denom = jnp.maximum(ss, jnp.finfo(jnp.float32).tiny)

    if fusion and K > 1:
        w = jax.nn.softmax(alpha.astype(jnp.float32))      # [K]
    else:
        w = jnp.zeros((K,), jnp.float32).at[0].set(1.0)    # score[:, 0]

    def fused_score(lo, col, imask):
        """Blended REnorm/fusion score of one slab -> [B, T]."""
        score = jnp.zeros(lo.shape, jnp.float32)
        for p_i, pmask in enumerate(part_masks(col, imask)):
            part = jnp.where(pmask[:, None, :],
                             jnp.exp(jnp.where(pmask[:, None, :], lo,
                                               NEG_INF)
                                     - m_safe[p_i][..., None]), 0.0) \
                / denom[p_i][..., None]
            gate = phi[..., p_i:p_i + 1] if extra else 1.0
            score = score + gate * part
        fused = jnp.einsum("bkt,k->bt", score, w)
        return jnp.where(imask, fused, NEG_INF)            # padded items out

    return B, n_tiles, slab_logits, fused_score


def streamed_multi_topk(sr, table, iids, phi, alpha, *, num_items, extra,
                        fusion, k=20, scale=12.0, normalize_table=True,
                        compute_dtype=None, tile=TILE):
    """Global top-k (values, item ids) of MSGIFSR's blended REnorm/fusion
    score (msgifsr.py:283-317) without materialising ``[B, K, P]``
    scores: pass 1 accumulates the softmax stats, pass 2 forms each
    slab's blended score and merges its top-k into the running
    candidates.  Serves the multi-order head at serving-scale catalogs
    (serving.make_recommend_step); values are raw blended probabilities —
    rank-equivalent to the ``log(clamp(score))`` the model's apply
    returns (log is monotone above the clamp; a top-20 score below it
    cannot occur, see module docstring).

    Inputs mirror ``model.head_multi``: ``sr [B, K, d]``, raw ``table``,
    ``phi [B, K, 2]`` or None, ``alpha [K]``, ``iids [B, N]`` level-1
    session items with -1 padding.
    """
    B, n_tiles, slab_logits, fused_score = _multi_ctx(
        sr, table, iids, phi, alpha, num_items=num_items, extra=extra,
        fusion=fusion, scale=scale, normalize_table=normalize_table,
        compute_dtype=compute_dtype, tile=tile)

    # pass 2: blended score per slab + running top-k merge
    def score_body(carry, i):
        vals, idxs = carry
        lo, col, imask = slab_logits(i)
        fused = fused_score(lo, col, imask)
        tv, ti = jax.lax.top_k(fused, k)
        carry = _merge_topk(vals, idxs, tv, ti + i * tile, k)
        return carry, None

    init = (jnp.full((B, k), NEG_INF, jnp.float32),
            jnp.zeros((B, k), jnp.int32))
    (vals, idxs), _ = jax.lax.scan(score_body, init, jnp.arange(n_tiles))
    return vals, idxs


def streamed_multi_topk_ranks(sr, table, labels, iids, phi, alpha, *,
                              num_items, extra, fusion, k=20, scale=12.0,
                              normalize_table=True, compute_dtype=None,
                              tile=TILE):
    """Label ranks for MSGIFSR's REnorm/fusion head via the per-slab
    top-k merges of ``streamed_multi_topk`` (the ``rank_method="topk"``
    A/B path; counting below is the default)."""
    vals, idxs = streamed_multi_topk(
        sr, table, iids, phi, alpha, num_items=num_items, extra=extra,
        fusion=fusion, k=k, scale=scale, normalize_table=normalize_table,
        compute_dtype=compute_dtype, tile=tile)
    return _ranks_of(labels, idxs, vals)


def streamed_multi_count_ranks(sr, table, labels, iids, phi, alpha, *,
                               num_items, extra, fusion, k=20, scale=12.0,
                               normalize_table=True, compute_dtype=None,
                               tile=TILE, col_offset=0, n_valid=None,
                               axis_name=None):
    """Counting form of the multi-order streamed ranker (the default —
    no per-slab sorts; see scoring.label_ranks_by_count for the tie
    argument).

    Same two streaming passes as the top-k form: pass 1 (inside
    ``_multi_ctx``) accumulates the LSE stats, pass 2 forms each slab's
    blended score with the IDENTICAL float ops and (a) plucks the
    label's own fused score from the slab that owns its column, (b)
    counts strictly-greater scores and the stable-tie term.  The
    label's score therefore compares bitwise-equal against its own
    column, so ranks match the materialised path exactly, ties included
    (tests/test_streamed_eval.py).  Counting needs the label score
    BEFORE the comparisons, so (a) runs as its own cheap scan over the
    already-computed stats — the slab matmul dominates both.
    """
    B, n_tiles, slab_logits, fused_score = _multi_ctx(
        sr, table, iids, phi, alpha, num_items=num_items, extra=extra,
        fusion=fusion, scale=scale, normalize_table=normalize_table,
        compute_dtype=compute_dtype, tile=tile, col_offset=col_offset,
        n_valid=n_valid, axis_name=axis_name)
    labels = labels.astype(jnp.int32)
    if n_valid is None:
        n_valid = num_items

    def lv_body(carry, i):
        lo, col, imask = slab_logits(i)
        fused = fused_score(lo, col, imask)
        local = labels - col_offset - i * tile
        present = (local >= 0) & (local < tile)
        got = jnp.take_along_axis(
            fused, jnp.clip(local, 0, tile - 1)[:, None], axis=1)[:, 0]
        return jnp.where(present, got, carry), None

    lv, _ = jax.lax.scan(lv_body, jnp.full((B,), NEG_INF, jnp.float32),
                         jnp.arange(n_tiles))
    if axis_name is not None:
        owned = (labels >= col_offset) & (labels - col_offset < n_valid)
        lv = jax.lax.psum(jnp.where(owned, lv, 0.0), axis_name)

    def count_body(carry, i):
        gt, eq = carry
        lo, col, imask = slab_logits(i)
        fused = fused_score(lo, col, imask)
        gt = gt + jnp.sum((fused > lv[:, None]).astype(jnp.int32), axis=1)
        eq = eq + jnp.sum(((fused == lv[:, None])
                           & (col[None, :] < labels[:, None]))
                          .astype(jnp.int32), axis=1)
        return (gt, eq), None

    zeros = jnp.zeros((B,), jnp.int32)
    (gt, eq), _ = jax.lax.scan(count_body, (zeros, zeros),
                               jnp.arange(n_tiles))
    if axis_name is not None:
        gt = jax.lax.psum(gt, axis_name)
        eq = jax.lax.psum(eq, axis_name)
    rank = gt + eq + 1
    return jnp.where(rank <= k, rank, 0)
