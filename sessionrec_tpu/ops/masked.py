"""Masked reductions over padded axes.

These are the dense-layout equivalents of DGL's segment kernels
(reference: dgl.ops.segment.segment_softmax / segment_reduce, used at
src/models/srgnn.py:84-86, lessr.py:111-113, msgifsr.py:86,143-146, and
dgl.ops.edge_softmax at lessr.py:73, gatconv.py:300).

In the dense layout each session graph occupies one row of a padded
``[B, N, ...]`` tensor, with a ``mask`` marking real entries.  A
"segment" reduction over a batched graph's nodes is then simply a masked
reduction over axis 1, which XLA fuses into neighbouring elementwise work
— no scatter/gather, no sorting, fully static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

# Large-but-finite negative used to mask logits; finite so that an
# all-masked row yields zeros (not NaNs) after the exp-normalise.
NEG_INF = -1e30


def masked_softmax(e, mask, axis: int):
    """Softmax of ``e`` over ``axis`` restricted to ``mask`` (0/1 or bool).

    Entries where ``mask`` is 0 receive probability exactly 0.  Rows whose
    mask is entirely 0 return all-zero probabilities (matching DGL's
    behaviour for zero-in-degree destination nodes, where no message is
    delivered at all).

    The exp-normalise always runs in float32 (attention weights in
    bfloat16 lose rank fidelity); the result is cast back to the input
    dtype so surrounding bf16 compute stays bf16.
    """
    in_dtype = e.dtype
    mask = mask.astype(bool)
    e = jnp.where(mask, e.astype(jnp.float32), NEG_INF)
    m = jnp.max(e, axis=axis, keepdims=True)
    # Guard: for an all-masked row m == NEG_INF; shift so exp() is finite.
    m = jnp.maximum(m, NEG_INF * 0.5)
    ex = jnp.where(mask, jnp.exp(e - m), 0.0)
    s = jnp.sum(ex, axis=axis, keepdims=True)
    out = ex / jnp.maximum(s, jnp.finfo(ex.dtype).tiny)
    return out.astype(in_dtype)


def masked_sum(x, mask, axis: int):
    """Sum of ``x`` over ``axis`` restricted to ``mask``.

    ``mask`` is broadcast against ``x`` (append trailing 1-dims as needed
    before calling for feature axes).
    """
    return jnp.sum(x * mask.astype(x.dtype), axis=axis)


def masked_mean(x, mask, axis: int):
    """Mean of ``x`` over ``axis`` restricted to ``mask`` (safe for empty)."""
    mask = mask.astype(x.dtype)
    s = jnp.sum(x * mask, axis=axis)
    n = jnp.sum(mask, axis=axis)
    return s / jnp.maximum(n, 1.0)


def masked_max(x, mask, axis: int, neg=NEG_INF):
    """Max of ``x`` over ``axis`` restricted to ``mask`` (empty rows -> neg)."""
    x = jnp.where(mask.astype(bool), x, neg)
    return jnp.max(x, axis=axis)
