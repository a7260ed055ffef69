"""Stochastic rounding float32 -> bfloat16 (counter-hash, plain XLA).

Used by the trainer to keep the item-embedding table (and its Adam
moments) stored in bfloat16: a deterministic round-to-nearest table
update stalls once ``|lr * adam_step| < 2^-9 * |weight|`` (bf16 has an
8-bit mantissa), which happens as soon as StepLR decays the reference's
1e-3 base rate (train.py:75).  Rounding the updated value down/up with
probability proportional to the discarded mantissa keeps the update
unbiased: E[sr(x)] == x exactly, so long-run training matches the f32
master-weight trajectory in expectation while the table's HBM footprint
and per-step optimizer traffic halve (BENCH_NOTES.md "next perf
levers"; the update pass is HBM-streaming-bound).

Random bits come from the same murmur3-finalizer counter hash as
ops/dropout.py — stateless, ~7 VPU ops per element, bit-identical on
every backend (integer ops only), and fusable by XLA into the
surrounding optimizer arithmetic (a pallas_call here would force an HBM
round-trip of the full table around the custom call).

Mechanics: for finite x, bitcast f32 -> uint32, add a uniform 16-bit
value to the low (truncated) mantissa bits, truncate to the top 16 bits.
IEEE754 ordering makes this exact stochastic rounding toward the two
nearest bf16 neighbours in magnitude (sign bit untouched: the magnitude
field of a negative float grows the same way).  Carries propagate
mantissa -> exponent correctly by the same ordering.  NaN/Inf inputs are
passed through unperturbed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash16(seed, shape):
    """uint32 in [0, 2^16) from murmur3(seed, flat index)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    idx = rows * jnp.uint32(shape[1]) + cols
    h = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h >> 16


def stochastic_round_bf16_bits(x, seed):
    """The bf16 BIT PATTERNS (uint16) of ``stochastic_round_bf16(x, seed)``.

    Identical rounding decisions — the final f32 value has zeroed low
    mantissa bits, so its bf16 cast is exactly its top 16 bits; for the
    non-finite passthrough the quiet bit is OR'd onto NaNs whose payload
    lives only in the truncated low bits (an f32->bf16 ``convert`` also
    quiets NaNs; Inf has a zero mantissa and truncates exactly).

    Exists so the mesh table update can all-gather the 2-byte patterns:
    gathering the bf16 VALUES kept losing to XLA rescheduling the final
    f32->bf16 convert past the collective (even behind an explicit
    all_gather + optimization_barrier, observed on compiled HLO), which
    doubled the dominant wire term (train/runner.py
    _sharded_bf16_table_update).
    """
    x = x.astype(jnp.float32)
    shape2d = (int(x.size // x.shape[-1]), x.shape[-1])
    u = jax.lax.bitcast_convert_type(x, jnp.uint32).reshape(shape2d)
    r = _hash16(jnp.asarray(seed).reshape(()).astype(jnp.uint32), shape2d)
    finite = jnp.isfinite(x).reshape(shape2d)
    is_nan = jnp.isnan(x).reshape(shape2d)
    y = jnp.where(finite, u + r,
                  jnp.where(is_nan, u | jnp.uint32(0x00400000), u))
    return (y >> jnp.uint32(16)).astype(jnp.uint16).reshape(x.shape)


def bf16_from_bits(bits):
    """uint16 bf16 bit patterns -> bfloat16 values (pure bitcast)."""
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16)


def stochastic_round_bf16(x, seed):
    """Round f32 ``x`` (any rank >= 1) to bf16, stochastically.

    ``seed``: int32 scalar (or 1-element array); vary it per step — the
    mask is a pure function of (seed, element index).
    """
    return bf16_from_bits(stochastic_round_bf16_bits(x, seed))
