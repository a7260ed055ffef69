"""Catalog-sharded fused softmax-CE (shard_map + Pallas partial stats)
must match the dense oracle — values and gradients — on the virtual
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu.ops import xent
from sessionrec_tpu.parallel import mesh as M

pytestmark = [pytest.mark.slow,   # Pallas-in-shard_map parity: minutes
              pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")]


def _data(B=16, D=32, P=512, num_items=470, seed=0):
    rng = np.random.default_rng(seed)
    sr = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(P, D)), jnp.float32)
    table = table.at[num_items:].set(0.0)   # catalog padding rows
    labels = jnp.asarray(rng.integers(0, num_items, size=B), jnp.int32)
    valid = jnp.ones((B,), jnp.float32).at[-3:].set(0.0)
    return sr, table, labels, valid


@pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4), (8, 1)])
@pytest.mark.parametrize("normalize_table", [False, True])
def test_sharded_fused_loss_parity(dp, mp, normalize_table):
    from sessionrec_tpu.parallel.sharded import fused_nll_loss_sharded

    mesh = M.make_mesh(data=dp, model=mp)
    sr, table, labels, valid = _data()
    kw = dict(scale=12.0, num_items=470, normalize_table=normalize_table)

    def loss_sharded(sr, table):
        return fused_nll_loss_sharded(mesh, sr, table, labels, valid, **kw)

    def loss_dense(sr, table):
        per_row = xent.reference_xent(sr, table, labels, **kw)
        v = valid
        return jnp.sum(per_row * v) / jnp.maximum(jnp.sum(v), 1.0)

    ls, (dsr_s, dtab_s) = jax.value_and_grad(loss_sharded, argnums=(0, 1))(
        sr, table)
    ld, (dsr_d, dtab_d) = jax.value_and_grad(loss_dense, argnums=(0, 1))(
        sr, table)

    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dsr_s), np.asarray(dsr_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dtab_s), np.asarray(dtab_d),
                               rtol=1e-4, atol=1e-6)


def test_mesh_trainer_uses_fused_loss():
    """The mesh TrainRunner path (fused + sharded xent) must produce a
    finite, decreasing loss on a tiny NISER problem."""
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import SessionGraphBatch
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import make_train_step
    from sessionrec_tpu.parallel.sharded import init_sharded, place_batch

    mesh = M.make_mesh(data=4, model=2)
    num_items = 300
    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(0, num_items, size=rng.integers(2, 9)))
            for _ in range(16)]
    labels = list(rng.integers(0, num_items, size=16))
    batch = SessionGraphBatch(
        **builders.build_session_batch(seqs, labels, 8, 16))

    model = NISER(num_items=num_items, embedding_dim=32, num_layers=1,
                  feat_drop=0.0)
    params, _ = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-2, weight_decay=0.0,
                        steps_per_epoch=10)
    params, state, opt_state = init_sharded(model, tx, mesh,
                                            jax.random.PRNGKey(0))
    batch = place_batch(mesh, batch)

    step = make_train_step(model, tx, fused=True, mesh=mesh)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(6):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(params, state, opt_state,
                                              batch, sub)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
