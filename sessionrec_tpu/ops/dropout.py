"""Fused counter-hash dropout: murmur-mask in plain XLA + recompute-in-backward.

``jax.random.bernoulli`` costs dozens of ALU ops per element (threefry)
and its VJP saves the full mask as a residual; at ~13M dropped elements
per MSGIFSR train step the mask generation alone was ~1.5 ms/step
(measured, TPU v5e).  This op instead derives each element's keep-bit
from a murmur3-finalizer hash of ``(seed, element index)`` — ~7 VPU ops
per element, stateless, so the backward pass regenerates the identical
mask from the same seed: zero residual memory and no threefry.

The hash mask is written as ordinary ``jnp`` ops (iota + integer
arithmetic) rather than a Pallas kernel on purpose: a ``pallas_call`` is
a custom call XLA cannot fuse across, so a kernelized dropout forces an
HBM materialisation of its input and output at every one of the ~8
dropout sites in an MSGIFSR step (~100+ MB/step of pure round-trip
traffic).  As plain XLA ops the mask generation fuses into the
surrounding elementwise chains (attention softmax, feature projections)
and costs only VPU cycles.  An earlier Pallas version of this same hash
computed identical bits; replacing it was fusion-, not math-, motivated.

Semantics: inverted dropout, ``y = x/keep * [u < keep]`` with u uniform
— the same contract as torch nn.Dropout (reference applies feat_drop /
attn_drop throughout, e.g. srgnn.py:35, gatconv.py:283-284,301).
Bit-identical across backends (integer ops only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _keep_threshold(rate: float):
    # keep iff bits < keep_prob * 2^32  (bits uniform in [0, 2^32))
    keep = 1.0 - rate
    return jnp.uint32(min(int(keep * 4294967296.0), 4294967295))


def _hash_bits(seed, shape):
    """murmur3 finalizer of (seed, flat element index) -> uint32."""
    R, C = shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    idx = rows * jnp.uint32(C) + cols
    h = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _apply(x2d, seed, rate):
    keep = _hash_bits(seed[0], x2d.shape) < _keep_threshold(rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), jnp.float32)
    return jnp.where(keep, x2d * scale.astype(x2d.dtype),
                     jnp.zeros_like(x2d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout2d(x2d, seed, rate):
    return _apply(x2d, seed, rate)


def _dropout2d_fwd(x2d, seed, rate):
    return _apply(x2d, seed, rate), seed


def _dropout2d_bwd(rate, seed, g):
    # identical bits -> identical mask; dx = mask * g / keep
    return _apply(g, seed, rate), None


_dropout2d.defvjp(_dropout2d_fwd, _dropout2d_bwd)


def dropout(key, x, rate: float, *, use_pallas: bool | None = None):
    """Inverted dropout on ``x`` (any rank; last axis = features).

    ``key`` is a JAX PRNG key (only its data is used, as the hash seed).
    ``use_pallas`` selects the counter-hash fast path (named for the
    original Pallas kernel this fused XLA expression replaced); tiny or
    feature-poor tensors fall back to ``jax.random.bernoulli``.
    """
    if rate == 0.0:
        return x
    if use_pallas is None:
        use_pallas = x.shape[-1] >= 32 and x.size >= 4096
    if not use_pallas:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
    seed = jax.random.key_data(key).ravel()[-1:].astype(jnp.int32)
    C = x.shape[-1]
    y = _dropout2d(x.reshape(-1, C), seed, float(rate))
    return y.reshape(x.shape)
