"""Parameter initializers reproducing torch's schemes.

Two regimes exist in the reference:

* SRGNN / NISER / MSGIFSR call ``reset_parameters`` which overwrites
  *every* parameter with U(-1/sqrt(d), 1/sqrt(d)) (srgnn.py:126-129,
  niser.py:125-128, msgifsr.py:224-227) — including the vendored
  GATConv's xavier init.
* LESSR has no reset: each submodule keeps its torch default init
  (Linear: kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ..) with
  bias U(-1/sqrt(fan_in), ..); GRU: U(-1/sqrt(H), ..) on all weights;
  Embedding: N(0, 1); PReLU: 0.25; BatchNorm: weight 1 / bias 0).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_params(key, in_dim, out_dim, bias=True, *, bound=None,
                  dtype=jnp.float32):
    """Linear layer params ``{w: [out, in], b: [out]}``.

    ``bound=None`` -> torch default (1/sqrt(fan_in) for both w and b);
    otherwise U(-bound, bound) for all (the reset_parameters regime).
    """
    kw, kb = jax.random.split(key)
    wb = bound if bound is not None else 1.0 / math.sqrt(in_dim)
    p = {"w": uniform(kw, (out_dim, in_dim), wb, dtype)}
    if bias:
        bb = bound if bound is not None else 1.0 / math.sqrt(in_dim)
        p["b"] = uniform(kb, (out_dim,), bb, dtype)
    return p


def gru_params(key, in_dim, hidden, *, bound=None, dtype=jnp.float32):
    """torch-layout GRU params (gates r,z,n stacked)."""
    ks = jax.random.split(key, 4)
    b = bound if bound is not None else 1.0 / math.sqrt(hidden)
    return {
        "w_ih": uniform(ks[0], (3 * hidden, in_dim), b, dtype),
        "w_hh": uniform(ks[1], (3 * hidden, hidden), b, dtype),
        "b_ih": uniform(ks[2], (3 * hidden,), b, dtype),
        "b_hh": uniform(ks[3], (3 * hidden,), b, dtype),
    }


def embedding_params(key, num_rows, dim, *, bound=None, dtype=jnp.float32):
    """Embedding table; torch default N(0,1) unless a uniform bound is given."""
    if bound is not None:
        return uniform(key, (num_rows, dim), bound, dtype)
    return jax.random.normal(key, (num_rows, dim), dtype)


def prelu_params(dim, dtype=jnp.float32):
    return {"a": jnp.full((dim,), 0.25, dtype)}


def batchnorm_params(dim, dtype=jnp.float32):
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def gat_params(key, in_dim, out_dim, num_heads, *, bound=None,
               dtype=jnp.float32):
    """GATConv params (vendored DGL layer, gatconv.py:137-178).

    ``bound`` given -> the MSGIFSR uniform-overwrite regime (the only
    user of GATConv).  Residual is identity (in_dim == out_dim holds at
    every call site, msgifsr.py:58-63), so it has no params.
    """
    ks = jax.random.split(key, 4)
    if bound is None:
        # torch/DGL defaults: xavier_normal(gain=relu) — kept for completeness
        gain = math.sqrt(2.0)
        std_fc = gain * math.sqrt(2.0 / (in_dim + out_dim * num_heads))
        fc = std_fc * jax.random.normal(ks[0], (out_dim * num_heads, in_dim), dtype)
        std_a = gain * math.sqrt(2.0 / (1 + out_dim))
        al = std_a * jax.random.normal(ks[1], (num_heads, out_dim), dtype)
        ar = std_a * jax.random.normal(ks[2], (num_heads, out_dim), dtype)
        bias = jnp.zeros((num_heads * out_dim,), dtype)
    else:
        fc = uniform(ks[0], (out_dim * num_heads, in_dim), bound, dtype)
        al = uniform(ks[1], (num_heads, out_dim), bound, dtype)
        ar = uniform(ks[2], (num_heads, out_dim), bound, dtype)
        bias = uniform(ks[3], (num_heads * out_dim,), bound, dtype)
    return {"fc": fc, "attn_l": al, "attn_r": ar, "bias": bias}
