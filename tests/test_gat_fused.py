"""Fused intra-GAT Pallas kernel (ops/gat_fused.py) vs the dense JAX
path (models/layers.py:gat_apply pair + head-max): values, gradients,
dropout bit-parity, and the full-model route (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sessionrec_tpu.models import init as I
from sessionrec_tpu.models.layers import RngGen, gat_apply
from sessionrec_tpu.ops.gat_fused import fused_intra_gat

B, N, D, H = 32, 5, 32, 4


@pytest.fixture(scope="module")
def setup():
    p1 = I.gat_params(jax.random.PRNGKey(1), D, D, H, bound=0.2)
    p2 = I.gat_params(jax.random.PRNGKey(2), D, D, H, bound=0.2)
    f = jax.random.normal(jax.random.PRNGKey(3), (B, N, D))
    adj = (jax.random.uniform(jax.random.PRNGKey(4), (B, N, N))
           < 0.4).astype(jnp.float32)
    return p1, p2, f, adj


def _ref(p1, p2, f, adj, rng, feat_drop=0.0, attn_drop=0.0, training=False):
    kw = dict(num_heads=H, feat_drop=feat_drop, attn_drop=attn_drop,
              training=training)
    acc = gat_apply(p1, f, f, adj, rng, **kw)
    acc = acc + gat_apply(p2, f, f, jnp.swapaxes(adj, 1, 2), rng, **kw)
    return jnp.max(acc, axis=2)


def _fus(p1, p2, f, adj, rng, feat_drop=0.0, attn_drop=0.0, training=False):
    return fused_intra_gat(p1, p2, f, adj, rng, num_heads=H,
                           feat_drop=feat_drop, attn_drop=attn_drop,
                           training=training)


def test_forward_parity(setup):
    p1, p2, f, adj = setup
    np.testing.assert_allclose(np.asarray(_ref(p1, p2, f, adj, None)),
                               np.asarray(_fus(p1, p2, f, adj, None)),
                               atol=2e-6)


def test_gradient_parity(setup):
    p1, p2, f, adj = setup
    cot = jax.random.normal(jax.random.PRNGKey(5), (B, N, D))
    g1 = jax.grad(lambda *a: jnp.sum(_ref(*a, adj, None) * cot),
                  argnums=(0, 1, 2))(p1, p2, f)
    g2 = jax.grad(lambda *a: jnp.sum(_fus(*a, adj, None) * cot),
                  argnums=(0, 1, 2))(p1, p2, f)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_feat_dropout_bit_parity(setup):
    """Feature dropout uses the same counter-hash masks as ops/dropout.py
    (the unfused path's hash route needs last-dim >= 32 and size >= 4096
    — satisfied here), so fused and unfused agree bit-for-bit even with
    dropout active, gradients included."""
    p1, p2, f, adj = setup
    key = jax.random.PRNGKey(9)
    o1 = _ref(p1, p2, f, adj, RngGen(key), feat_drop=0.3, training=True)
    o2 = _fus(p1, p2, f, adj, RngGen(key), feat_drop=0.3, training=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-6)
    g1 = jax.grad(lambda x: jnp.sum(
        _ref(p1, p2, x, adj, RngGen(key), 0.3, 0.0, True) ** 2))(f)
    g2 = jax.grad(lambda x: jnp.sum(
        _fus(p1, p2, x, adj, RngGen(key), 0.3, 0.0, True) ** 2))(f)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_attn_dropout_deterministic_and_scaled(setup):
    p1, p2, f, adj = setup
    key = jax.random.PRNGKey(11)
    o1 = _fus(p1, p2, f, adj, RngGen(key), 0.0, 0.5, True)
    o2 = _fus(p1, p2, f, adj, RngGen(key), 0.0, 0.5, True)
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.all(jnp.isfinite(o1)))
    o3 = _fus(p1, p2, f, adj, RngGen(jax.random.PRNGKey(12)), 0.0, 0.5, True)
    assert not bool(jnp.all(o1 == o3))
    g = jax.grad(lambda x: jnp.sum(
        _fus(p1, p2, x, adj, RngGen(key), 0.2, 0.2, True) ** 2))(f)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_no_edge_sessions(setup):
    """Length-1 sessions have empty adjacencies: attention contributes 0
    and the output reduces to max_h(residual + bias) — both paths agree."""
    p1, p2, f, _ = setup
    adj = jnp.zeros((B, N, N), jnp.float32)
    np.testing.assert_allclose(np.asarray(_ref(p1, p2, f, adj, None)),
                               np.asarray(_fus(p1, p2, f, adj, None)),
                               atol=2e-6)


def test_model_route_matches_dense():
    """MSGIFSR with fused_gat=True (interpret mode off-TPU) matches the
    dense path end-to-end at order 1."""
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import CcsBatch, CcsLevel
    from sessionrec_tpu.models import MSGIFSR

    rng = np.random.default_rng(0)
    num_items, bsz = 120, 8
    seqs = [list(rng.integers(0, num_items, size=rng.integers(1, 8)))
            for _ in range(bsz)]
    labels = list(rng.integers(0, num_items, size=bsz))
    d = builders.build_ccs_batch(seqs, labels, 1, 8, bsz)
    batch = CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                     inter_in=tuple(d["inter_in"]),
                     inter_out=tuple(d["inter_out"]),
                     labels=d["labels"], valid=d["valid"])

    kw = dict(num_items=num_items, embedding_dim=32, num_layers=1,
              feat_drop=0.0, order=1)
    m_dense = MSGIFSR(**kw, fused_gat=False)
    m_fused = MSGIFSR(**kw, fused_gat=True)
    params, state = m_dense.init(jax.random.PRNGKey(0))
    lp1, _ = m_dense.apply(params, state, batch, training=False, rng=None)
    lp2, _ = m_fused.apply(params, state, batch, training=False, rng=None)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-5)
