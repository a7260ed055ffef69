"""GRU cells with torch-compatible math and weight layout.

Replaces the cuDNN GRUs used by the reference (nn.GRUCell at
src/models/srgnn.py:16, nn.GRU at src/models/lessr.py:15 and
src/models/msgifsr.py:25) with plain ``lax``-level JAX so the whole model
stays a single XLA program.

Weight layout follows torch exactly so parity tests can copy weights
verbatim: ``w_ih [3H, In]``, ``w_hh [3H, H]``, ``b_ih [3H]``, ``b_hh [3H]``
with gate order (reset, update, new).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_cell(params, x, h):
    """One torch-semantics GRU step.

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h
    """
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(params, xs, h0=None):
    """Run a GRU over ``xs [..., T, In]``; returns final hidden ``[..., H]``.

    Equivalent to ``nn.GRU(batch_first=True)(xs)[1].squeeze(0)`` for a
    single layer.  T is static; short sequences (the SemanticExpander's
    k-grams, T <= 4) unroll into straight-line code — a 2-3-trip
    ``lax.scan`` lowers to an XLA while loop that serialises and blocks
    fusion inside the training step (profiled on the MSGIFSR order-3
    config) — longer ones use ``lax.scan``.
    """
    T = xs.shape[-2]
    H = params["w_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros(xs.shape[:-2] + (H,), dtype=xs.dtype)

    if T <= 4:
        h = h0
        for t in range(T):
            h = gru_cell(params, xs[..., t, :], h)
        return h

    def step(h, t):
        x = jax.lax.dynamic_index_in_dim(xs, t, axis=-2, keepdims=False)
        return gru_cell(params, x, h), None

    h, _ = jax.lax.scan(step, h0, jnp.arange(T))
    return h


def masked_mailbox_gru(params, mail, mail_mask, unroll_limit=32):
    """Ordered-mailbox GRU — the EOPA reducer (reference: lessr.py:20-27).

    ``mail``: ``[..., D, d]`` messages in temporal (edge-insertion) order,
    left-aligned; ``mail_mask``: ``[..., D]`` validity.  Rows advance the
    hidden state only on valid slots, so the final hidden equals a torch
    GRU run over exactly the real in-messages.  Zero-degree rows return 0
    (DGL update_all leaves unmessaged nodes at zero).

    Mailbox depths up to ``unroll_limit`` unroll into straight-line code:
    a D-trip ``lax.scan`` lowers to an XLA while loop whose per-iteration
    launch + dynamic-slice overhead dominates at these sizes (D<=19,
    dim 32 — profiled on the LESSR bench config).  The input-side gates
    are computed per step, NOT hoisted into one [..., D, 3H] matmul:
    that variant was measured (bench `lessr`, v5e) at 45.7k vs 50.5k
    examples/s — the materialised 3H-wide tensor triples the step's HBM
    bytes at dim 32, costing more than the batched matmul saves.
    """
    D = mail.shape[-2]
    H = params["w_hh"].shape[1]
    h = jnp.zeros(mail.shape[:-2] + (H,), dtype=mail.dtype)
    keep = mail_mask[..., None].astype(bool)              # [..., D, 1]

    if D <= unroll_limit:
        for t in range(D):
            h_new = gru_cell(params, mail[..., t, :], h)
            h = jnp.where(keep[..., t, :], h_new, h)
        return h

    def step(h, xs):
        x, m = xs
        h_new = gru_cell(params, x, h)
        return jnp.where(m, h_new, h), None

    h, _ = jax.lax.scan(step, h,
                        (jnp.moveaxis(mail, -2, 0),
                         jnp.moveaxis(keep, -2, 0)))
    return h
