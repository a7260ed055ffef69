"""Row-chunked fused losses (ops/xent.py:MAX_KERNEL_ROWS).

The Pallas kernels keep all batch rows resident while streaming the
catalog; past ~4k rows (measured on v5e) their scoped-vmem stack
overflows, so the loss entries chunk the batch OUTSIDE the kernel.
Per-row losses are independent, so chunking must be exact — verified
here against the unchunked path with a monkeypatched row cap (the
selection logic is dtype-path-agnostic, so the CPU oracle exercises
the same slicing/padding/concat code the TPU kernels run under).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu.ops import xent
from sessionrec_tpu.ops.xent_multi import multi_nll_loss


def _plain_case(B=150, P=500, d=16, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(P + 12, d)), jnp.float32)
    sr = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, P, B), jnp.int32)
    valid = jnp.asarray(rng.random(B) < 0.9)
    return sr, table, labels, valid, P


def test_chunked_plain_loss_matches_unchunked(monkeypatch):
    sr, table, labels, valid, P = _plain_case()
    kw = dict(scale=12.0, num_items=P, normalize_table=True)
    ref = xent.fused_nll_loss(sr, table, labels, valid, **kw)
    g_ref = jax.grad(lambda s: xent.fused_nll_loss(s, table, labels,
                                                   valid, **kw))(sr)
    monkeypatch.setattr(xent, "MAX_KERNEL_ROWS", 64)   # -> 3 chunks + pad
    got = xent.fused_nll_loss(sr, table, labels, valid, **kw)
    g_got = jax.grad(lambda s: xent.fused_nll_loss(s, table, labels,
                                                   valid, **kw))(sr)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("extra,fusion", [(True, True), (False, True)])
def test_chunked_multi_loss_matches_unchunked(monkeypatch, extra, fusion):
    rng = np.random.default_rng(1)
    # B > 2x the 256-row chunk floor so the cap below forces 3 chunks
    B, K, P, d, N = 600, 3, 400, 16, 6
    table = jnp.asarray(rng.normal(size=(P + 12, d)), jnp.float32)
    sr = jnp.asarray(rng.normal(size=(B, K, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, P, B), jnp.int32)
    valid = jnp.asarray(rng.random(B) < 0.9)
    iids = jnp.asarray(rng.integers(-1, P, (B, N)), jnp.int32)
    phi = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, K, 2)),
                                     jnp.float32), axis=-1) if extra else None
    alpha = jnp.asarray(rng.normal(size=(K,)), jnp.float32)
    kw = dict(scale=12.0, num_items=P, normalize_table=True,
              extra=extra, fusion=fusion)

    def loss(s):
        return multi_nll_loss(s, table, labels, valid, iids, phi, alpha,
                              **kw)
    ref, g_ref = loss(sr), jax.grad(loss)(sr)
    # chunk size floors at 256 -> the cap forces ceil(600/256)=3 chunks
    monkeypatch.setattr(xent, "MAX_KERNEL_ROWS", 300)
    got, g_got = loss(sr), jax.grad(loss)(sr)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)
