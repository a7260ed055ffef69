"""Fused MSGIFSR REnorm/fusion loss (ops/xent_multi.py): Pallas kernel
(interpret mode on CPU) vs the pure-jnp oracle vs the model's
materialised apply() path — values and gradients — plus the catalog-
sharded mesh variant on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # interpret-mode Pallas parity: minutes

from sessionrec_tpu.ops import xent_multi as xm
from sessionrec_tpu.ops import scoring
from sessionrec_tpu.parallel import mesh as M


def _data(B=16, K=3, D=32, P=512, num_items=470, N=6, seed=0):
    rng = np.random.default_rng(seed)
    sr = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(P, D)), jnp.float32)
    table = table.at[num_items:].set(0.0)
    # session items: some rows include the label, some don't
    iids = rng.integers(0, num_items, size=(B, N)).astype(np.int32)
    lens = rng.integers(1, N + 1, size=B)
    iids[np.arange(N)[None, :] >= lens[:, None]] = -1
    labels = rng.integers(0, num_items, size=B).astype(np.int32)
    labels[::2] = np.maximum(iids[::2, 0], 0)    # half in-session labels
    phi_logits = rng.normal(size=(B, K, 2)).astype(np.float32)
    phi = jax.nn.softmax(jnp.asarray(phi_logits), axis=-1)
    alpha = jnp.asarray(rng.normal(size=K), jnp.float32)
    valid = jnp.ones((B,), jnp.float32).at[-3:].set(0.0)
    return (sr, table, jnp.asarray(labels), valid, jnp.asarray(iids), phi,
            alpha)


@pytest.mark.parametrize("extra,fusion", [(True, True), (True, False),
                                          (False, True)])
@pytest.mark.parametrize("normalize_table", [False, True])
def test_pallas_matches_reference(extra, fusion, normalize_table):
    sr, table, labels, valid, iids, phi, alpha = _data()
    kw = dict(scale=12.0, num_items=470, normalize_table=normalize_table,
              extra=extra, fusion=fusion)

    def loss(use_pallas):
        def f(sr, table, phi, alpha):
            return xm.multi_nll_loss(sr, table, labels, valid, iids, phi,
                                     alpha, use_pallas=use_pallas, **kw)
        return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(sr, table, phi,
                                                           alpha)

    lp, gp = loss(True)     # Pallas custom-vjp path (interpret on CPU)
    lr, gr = loss(False)    # plain-jnp autodiff oracle
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for a, b, name in zip(gp, gr, ["sr", "table", "phi", "alpha"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6, err_msg=name)


@pytest.mark.parametrize("extra,fusion", [(True, True), (False, True),
                                          (True, False)])
def test_fused_loss_matches_model_apply(extra, fusion):
    """The fused loss must equal nll(model.apply log-probs) on a real CCS
    batch — the integration-level REnorm/fusion parity check."""
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import CcsBatch, CcsLevel
    from sessionrec_tpu.models import MSGIFSR
    from sessionrec_tpu.ops.xent_multi import multi_nll_loss

    num_items, B, order = 200, 12, 2
    rng = np.random.default_rng(1)
    seqs = [list(rng.integers(0, num_items, size=rng.integers(2, 9)))
            for _ in range(B)]
    labels = [int(s[-1]) if i % 2 == 0 else
              int(rng.integers(0, num_items))
              for i, s in enumerate(seqs)]   # half in-session labels
    d = builders.build_ccs_batch(seqs, labels, order, 10, B)
    batch = CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                     inter_in=tuple(d["inter_in"]),
                     inter_out=tuple(d["inter_out"]),
                     labels=d["labels"], valid=d["valid"])

    model = MSGIFSR(num_items=num_items, embedding_dim=16, num_layers=1,
                    order=order, feat_drop=0.0, extra=extra, fusion=fusion)
    params, state = model.init(jax.random.PRNGKey(0))

    def loss_fused(p):
        sr, table, phi, alpha, iids, _ = model.head_multi(
            p, state, batch, training=False, rng=None)
        return multi_nll_loss(sr, table, batch.labels, batch.valid, iids,
                              phi, alpha, scale=12.0, num_items=num_items,
                              normalize_table=model.table_norm, extra=extra,
                              fusion=fusion, use_pallas=False)

    def loss_apply(p):
        log_probs, _ = model.apply(p, state, batch, training=False,
                                   rng=None)
        return scoring.nll_loss(log_probs, batch.labels, batch.valid)

    lf, gf = jax.value_and_grad(loss_fused)(params)
    la, ga = jax.value_and_grad(loss_apply)(params)
    np.testing.assert_allclose(float(lf), float(la), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_a = jax.tree_util.tree_leaves(ga)
    for a, b in zip(flat_f, flat_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4)])
@pytest.mark.parametrize("extra,fusion", [(True, True), (False, True)])
def test_sharded_multi_loss_parity(dp, mp, extra, fusion):
    from sessionrec_tpu.parallel.sharded import fused_multi_loss_sharded

    mesh = M.make_mesh(data=dp, model=mp)
    sr, table, labels, valid, iids, phi, alpha = _data()
    kw = dict(scale=12.0, num_items=470, normalize_table=True, extra=extra,
              fusion=fusion)

    def loss_sharded(sr, table, phi, alpha):
        return fused_multi_loss_sharded(mesh, sr, table, labels, valid,
                                        iids, phi, alpha, **kw)

    def loss_dense(sr, table, phi, alpha):
        return xm.multi_nll_loss(sr, table, labels, valid, iids, phi,
                                 alpha, use_pallas=False, **kw)

    ls, gs = jax.value_and_grad(loss_sharded, argnums=(0, 1, 2, 3))(
        sr, table, phi, alpha)
    ld, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2, 3))(
        sr, table, phi, alpha)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
    for a, b, name in zip(gs, gd, ["sr", "table", "phi", "alpha"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6, err_msg=name)
