"""Full-catalog scoring: the [B, d] x [d, num_items] hot path.

The catalog axis is the framework's scaling dimension (SURVEY.md §2.3):
the item-embedding table is the one big tensor, and every forward ends in
a dense full-catalog matmul + (log-)softmax + (at eval) top-k
(reference: srgnn.py:145-147, niser.py:152-156, lessr.py:182-183,
msgifsr.py:276-321; topk at train.py:49).

The catalog is padded to a multiple of ``pad_catalog``'s default (512 —
the fused CE kernel's TILE_P, itself a multiple of the 128 MXU lane
width); padded columns are masked with a large negative before any
softmax so probabilities and rankings are identical to the unpadded
computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sessionrec_tpu.ops.masked import NEG_INF


def pad_catalog(num_items: int, multiple: int = 512) -> int:
    """Padded catalog size.

    The default multiple is the fused CE kernel's catalog tile
    (ops/xent.py:TILE_P = 512, itself a multiple of the 128 MXU lane
    width): when the embedding table is allocated at this size the
    Pallas kernel consumes it directly — profiling showed the previous
    128-padding cost a full-table pad copy before the kernel and a
    slice+add after its gradient on *every* training step (~220us/step
    at yoochoose-1/4 scale, ~5% of the step).

    NOTE: changing this multiple changes ``padded_items`` and therefore
    the embedding-table / optimizer-state shapes — checkpoints written
    under a different multiple will not restore against the new shape
    template (orbax restores by shape).  The 128 -> 512 change landed in
    round 2 before any long-lived checkpoints existed; migrate older
    ones by padding/slicing the table and moment rows to the new
    ``pad_catalog(num_items)``.
    """
    return ((num_items + multiple - 1) // multiple) * multiple


def item_mask(num_items: int, padded: int, dtype=jnp.float32):
    """[padded] 1/0 mask of real catalog entries (static)."""
    return (jnp.arange(padded) < num_items).astype(dtype)


def catalog_logits(sr, table, compute_dtype=None):
    """sr [.., d] @ table[P, d]^T -> [.., P] in f32 accumulation.

    ``compute_dtype`` (e.g. jnp.bfloat16) casts the matmul *inputs* so the
    MXU runs at bf16 rate; accumulation stays float32 either way.
    """
    if compute_dtype is not None:
        sr = sr.astype(compute_dtype)
        table = table.astype(compute_dtype)
    return jax.lax.dot_general(
        sr, table,
        dimension_numbers=(((sr.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def log_softmax_scores(sr, table, imask, scale: float = 1.0,
                       compute_dtype=None):
    """log(softmax(scale * sr @ table^T)) over real items.

    Padded columns get ~NEG_INF log-probability.  Matches
    ``th.log(softmax(...))`` (srgnn.py:147 / niser.py:154).
    """
    logits = scale * catalog_logits(sr, table, compute_dtype)
    logits = jnp.where(imask.astype(bool), logits, NEG_INF)
    return jax.nn.log_softmax(logits, axis=-1)


def masked_catalog_softmax(logits, col_mask):
    """softmax over the last axis restricted to ``col_mask`` (rows with an
    empty mask return zeros — used by MSGIFSR's REnorm split,
    msgifsr.py:289-292)."""
    neg = NEG_INF
    x = jnp.where(col_mask.astype(bool), logits, neg)
    m = jnp.maximum(jnp.max(x, axis=-1, keepdims=True), neg * 0.5)
    ex = jnp.where(col_mask.astype(bool), jnp.exp(x - m), 0.0)
    s = jnp.sum(ex, axis=-1, keepdims=True)
    return ex / jnp.maximum(s, jnp.finfo(ex.dtype).tiny)


def nll_loss(log_probs, labels, valid):
    """Mean negative log-likelihood over valid rows (train.py:99)."""
    lp = jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32),
                             axis=-1)[:, 0]
    v = valid.astype(lp.dtype)
    return -jnp.sum(lp * v) / jnp.maximum(jnp.sum(v), 1.0)


def use_count_ranks(rank_method) -> bool:
    """Resolve the eval rank method: None (auto) counts; "topk" opts into
    the reference-shaped sort; anything else is an error.  The single
    predicate for both the single-chip (train/runner.py) and mesh
    (parallel/sharded.py) eval paths, so a typo'd method name fails loudly
    instead of silently resolving differently per path."""
    if rank_method not in (None, "count", "topk"):
        raise ValueError(
            f"rank_method must be None, 'count' or 'topk', got "
            f"{rank_method!r}")
    return rank_method != "topk"


def topk_ranks(log_probs, labels, k: int):
    """Rank (1-based) of each label within the top-k, else 0.

    Reproduces evaluate() (train.py:45-53): top-k indices over the full
    catalog, rank found by position.  Ties resolve identically to
    ``lax.top_k`` (stable, lowest index first — torch.topk likewise).
    """
    _, idx = jax.lax.top_k(log_probs, k)
    hit = idx == labels[:, None]
    rank = jnp.argmax(hit, axis=-1) + 1
    return jnp.where(jnp.any(hit, axis=-1), rank, 0)


def label_ranks_by_count(scores, labels, k: int):
    """``topk_ranks`` without the sort: count instead of select.

    The eval protocol (train.py:45-53) only ever needs the rank of the
    *label* column, and that rank is a counting problem: the label sits
    at position ``#{j : s_j > s_label} + #{j : s_j == s_label, j < label}``
    of the descending sort — the second term is exactly ``lax.top_k``'s
    stable tie rule (equal values ordered by ascending index), so this
    returns bit-identical ranks to ``topk_ranks`` on any NaN-free input,
    ties included (tests/test_ops.py; torch.topk's tie order is NOT
    guaranteed stable, but exact float ties are measure-zero in real
    logits).  NaN scores are the one exception: ``NaN > lv`` and
    ``NaN == lv`` are both false here while ``lax.top_k`` gives NaNs a
    backend-defined order — irrelevant in practice because training
    aborts on the first non-finite loss (runner._drain_losses) before a
    diverged model ever reaches eval.

    Why it exists: a full ``lax.top_k`` over ``[B, P]`` is a
    sort-flavoured kernel whose cost grows steeply with the catalog
    (measured 45.3 ms/eval-batch at B=512, P=2^20 — dominating eval at
    serving scale), while two fused masked reductions read the scores
    tensor once at HBM speed.  Padded catalog columns need no special
    case as long as they score strictly below the label (they carry
    ~NEG_INF in every caller; the label column itself is always a real
    item).
    """
    labels = labels[:, None].astype(jnp.int32)
    lv = jnp.take_along_axis(scores, labels, axis=-1)
    col = jnp.arange(scores.shape[-1])[None, :]
    greater = jnp.sum((scores > lv).astype(jnp.int32), axis=-1)
    eq_before = jnp.sum(((scores == lv) & (col < labels)).astype(jnp.int32),
                        axis=-1)
    rank = greater + eq_before + 1
    return jnp.where(rank <= k, rank, 0)
