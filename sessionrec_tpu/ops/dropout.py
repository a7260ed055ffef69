"""Pallas TPU dropout: counter-based hash RNG + recompute-in-backward.

``jax.random.bernoulli`` costs dozens of ALU ops per element (threefry)
and its VJP saves the full mask as a residual; at ~13M dropped elements
per MSGIFSR train step the mask generation alone was ~1.5 ms/step
(measured, TPU v5e).  This kernel derives each element's keep-bit from a
murmur3-finalizer hash of ``(seed, element index)`` — ~7 VPU ops per
element, stateless, so the backward pass regenerates the identical mask
from the same seed: zero residual memory, no threefry, and bit-identical
behaviour between the compiled TPU kernel and the CPU interpreter (the
TPU hardware PRNG is unavailable under interpret mode).

Semantics: inverted dropout, ``y = x/keep * [u < keep]`` with u uniform
— the same contract as torch nn.Dropout (reference applies feat_drop /
attn_drop throughout, e.g. srgnn.py:35, gatconv.py:283-284,301).

The kernel operates on ``[R, C]`` with the feature axis minor; callers
reshape (major-dim merges are free).  Non-TPU backends fall back to
``jax.random.bernoulli``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _keep_threshold(rate: float):
    # keep iff bits < keep_prob * 2^32  (bits uniform in [0, 2^32))
    keep = 1.0 - rate
    return jnp.uint32(min(int(keep * 4294967296.0), 4294967295))


def _hash_bits(seed, shape, row_offset):
    """murmur3 finalizer of (seed, flat element index) -> uint32."""
    R, C = shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    idx = (rows + jnp.uint32(row_offset)) * jnp.uint32(C) + cols
    h = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _mask_kernel(rate, rt, x_ref, seed_ref, out_ref):
    bits = _hash_bits(seed_ref[0], x_ref.shape, pl.program_id(0) * rt)
    keep = bits < _keep_threshold(rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), jnp.float32)
    out_ref[:] = jnp.where(keep, x_ref[:] * scale.astype(x_ref.dtype),
                           jnp.zeros_like(x_ref))


def _apply(x2d, seed, rate):
    R, C = x2d.shape
    rt = min(_ROW_TILE, _round_up(R, 8))
    Rp = _round_up(R, rt)
    xp = jnp.pad(x2d, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mask_kernel, rate, rt),
        grid=(Rp // rt,),
        in_specs=[
            pl.BlockSpec((rt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rt, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C), x2d.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xp, seed)
    return out[:R]


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

    ``key`` is a JAX PRNG key (only its data is used, as the kernel
    seed).  Chooses the Pallas path on TPU for layout-friendly shapes
    (feature axis >= 32 lanes); otherwise jax.random.bernoulli.
    """
    if rate == 0.0:
        return x
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and x.shape[-1] >= 32 and x.size >= 4096)
    if not use_pallas:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
    seed = jax.random.key_data(key).ravel()[-1:].astype(jnp.int32)
    C = x.shape[-1]
    y = _dropout2d(x.reshape(-1, C), seed, float(rate))
    return y.reshape(x.shape)
