"""Multi-device tests on the virtual 8-device CPU mesh (conftest).

Checks: sharded train step == single-device train step; distributed
top-k == dense top-k; embedding table actually row-sharded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sessionrec_tpu.graph import builders
from sessionrec_tpu.graph.batch import SessionGraphBatch
from sessionrec_tpu.models import NISER
from sessionrec_tpu.parallel import mesh as M
from sessionrec_tpu.parallel import sharded as S
from sessionrec_tpu.train.optim import make_optimizer
from sessionrec_tpu.train.runner import make_train_step

NUM_ITEMS = 300


def _batch(B=8):
    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(0, NUM_ITEMS, size=rng.integers(1, 9)))
            for _ in range(B)]
    labels = list(rng.integers(0, NUM_ITEMS, size=B))
    return SessionGraphBatch(**builders.build_session_batch(seqs, labels, 8, B))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_train_step_matches_single_device():
    model = NISER(num_items=NUM_ITEMS, embedding_dim=32, num_layers=1,
                  feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-3, weight_decay=1e-4,
                        steps_per_epoch=10)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    step = make_train_step(model, tx)

    # single device
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    o1 = tx.init(p1)
    p1, _, o1, loss1 = step(p1, state, o1, batch, rng)

    # 4x2 (data, model) mesh; the mesh-aware step pins updated params
    # back to the canonical sharding (ZeRO moments shard further)
    mesh = M.make_mesh(data=4, model=2)
    p2, s2, o2 = S.init_sharded(model, tx, mesh, jax.random.PRNGKey(0))
    b2 = S.place_batch(mesh, batch)
    step_mesh = make_train_step(model, tx, mesh=mesh)
    p2, _, o2, loss2 = step_mesh(p2, s2, o2, b2, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["embedding"]),
                               np.asarray(p2["embedding"]), atol=1e-5)
    # table is genuinely row-sharded over 'model'
    shard_shapes = {tuple(s.data.shape)
                    for s in p2["embedding"].addressable_shards}
    assert shard_shapes == {(model.padded_items // 2, 32)}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_topk_matches_dense():
    mesh = M.make_mesh(data=4, model=2)
    rng = np.random.default_rng(0)
    lp = rng.normal(size=(16, 256)).astype(np.float32)
    lp_sharded = jax.device_put(
        jnp.asarray(lp),
        jax.NamedSharding(mesh, P(M.DATA_AXIS, M.MODEL_AXIS)))
    v, i = S.sharded_topk(mesh, lp_sharded, 20)
    vd, idd = jax.lax.top_k(jnp.asarray(lp), 20)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vd), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(idd))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_eval_step_counts():
    model = NISER(num_items=NUM_ITEMS, embedding_dim=32, num_layers=1,
                  feat_drop=0.0)
    mesh = M.make_mesh(data=4, model=2)
    tx = make_optimizer(model.init(jax.random.PRNGKey(0))[0], 1e-3, 1e-4, 10)
    params, state, _ = S.init_sharded(model, tx, mesh, jax.random.PRNGKey(0))
    batch = S.place_batch(mesh, _batch())
    ev = S.make_sharded_eval_step(model, mesh, cutoff=20)
    hit, mrr, n = ev(params, state, batch)
    assert float(n) == 8
    assert 0 <= float(hit) <= 8
    assert 0 <= float(mrr) <= float(hit)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_count_ranks_matches_dense_topk():
    """Counting ranks over catalog shards == one global lax.top_k,
    ties included (engineered equal columns straddling shards)."""
    from sessionrec_tpu.ops import scoring
    mesh = M.make_mesh(data=4, model=2)
    rng = np.random.default_rng(3)
    lp = np.round(rng.normal(size=(16, 256)) * 10) / 10    # many exact ties
    lp = lp.astype(np.float32)
    lp[:, 200] = lp[:, 7]                                  # cross-shard tie
    labels = rng.integers(0, 256, size=16).astype(np.int32)
    labels[0], labels[1] = 7, 200
    lp_sharded = jax.device_put(
        jnp.asarray(lp),
        jax.NamedSharding(mesh, P(M.DATA_AXIS, M.MODEL_AXIS)))
    got = S.sharded_count_ranks(mesh, lp_sharded, jnp.asarray(labels), 20)
    want = scoring.topk_ranks(jnp.asarray(lp), jnp.asarray(labels), 20)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_eval_rank_methods_identical():
    """Mesh eval metrics agree between the counting default and the
    candidate-merge top-k A/B path, and with the single-device eval."""
    from sessionrec_tpu.train.runner import make_eval_step
    model = NISER(num_items=NUM_ITEMS, embedding_dim=32, num_layers=1,
                  feat_drop=0.0)
    mesh = M.make_mesh(data=4, model=2)
    tx = make_optimizer(model.init(jax.random.PRNGKey(0))[0], 1e-3, 1e-4, 10)
    params, state, _ = S.init_sharded(model, tx, mesh, jax.random.PRNGKey(0))
    batch = _batch()
    placed = S.place_batch(mesh, batch)
    outs = []
    for method in (None, "count", "topk"):
        ev = S.make_sharded_eval_step(model, mesh, cutoff=20,
                                      rank_method=method)
        hit, mrr, n = ev(params, state, placed)
        outs.append((float(hit), round(float(mrr), 6), float(n)))
    assert outs[0] == outs[1] == outs[2]
    # single-device oracle on gathered params
    host_params = jax.tree_util.tree_map(np.asarray, params)
    ev1 = make_eval_step(model, cutoff=20)
    hit, mrr, n = ev1(host_params, state, batch)
    assert (float(hit), round(float(mrr), 6), float(n)) == outs[0]


def test_dp_only_mesh_warns():
    """A dp-only mesh pays ~2x embedding-gradient wire (BENCH_NOTES r4);
    the session wiring must surface that at mesh construction.  The
    package logger doesn't propagate to root, so capture via a handler."""
    import logging
    from types import SimpleNamespace
    from sessionrec_tpu.train import session as S

    records = []

    class _H(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = _H()
    logging.getLogger("sessionrec_tpu.train.session").addHandler(h)
    try:
        mesh = S._make_mesh(SimpleNamespace(data_parallel=4,
                                            model_parallel=1))
        assert mesh is not None
        assert dict(mesh.shape) == {"data": 4, "model": 1}
        assert any("model-parallel 2" in m for m in records)

        records.clear()
        mesh = S._make_mesh(SimpleNamespace(data_parallel=4,
                                            model_parallel=2))
        assert not any("model-parallel" in m for m in records)
    finally:
        logging.getLogger("sessionrec_tpu.train.session").removeHandler(h)


def _ccs_batch(order=3, B=8, max_len=8):
    from sessionrec_tpu.graph.batch import CcsBatch, CcsLevel
    rng = np.random.default_rng(4)
    seqs = [list(rng.integers(0, NUM_ITEMS, size=rng.integers(2, max_len + 1)))
            for _ in range(B)]
    labels = list(rng.integers(0, NUM_ITEMS, size=B))
    d = builders.build_ccs_batch(seqs, labels, order, max_len, B)
    return CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                    inter_in=tuple(d["inter_in"]),
                    inter_out=tuple(d["inter_out"]),
                    labels=d["labels"], valid=d["valid"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_multi_head_eval_matches_single_device():
    """Mesh eval of the MSGIFSR REnorm/fusion head (fused-stats counting,
    no [B, K, P] scores or [B, P] session mask) == the single-device
    eval, exactly."""
    from sessionrec_tpu.models import MSGIFSR
    from sessionrec_tpu.train.runner import make_eval_step
    model = MSGIFSR(num_items=NUM_ITEMS, embedding_dim=32, num_layers=1,
                    order=3, extra=True, fusion=True, feat_drop=0.0)
    mesh = M.make_mesh(data=4, model=2)
    tx = make_optimizer(model.init(jax.random.PRNGKey(0))[0], 1e-3, 1e-4, 10)
    params, state, _ = S.init_sharded(model, tx, mesh, jax.random.PRNGKey(2))
    batch = _ccs_batch()
    placed = S.place_batch(mesh, batch)
    ev = S.make_sharded_eval_step(model, mesh, cutoff=20)
    hit, mrr, n = ev(params, state, placed)

    host_params = jax.tree_util.tree_map(np.asarray, params)
    ev1 = make_eval_step(model, cutoff=20)
    hit1, mrr1, n1 = ev1(host_params, state, batch)
    assert float(n) == float(n1) == 8
    assert float(hit) == float(hit1)
    np.testing.assert_allclose(float(mrr), float(mrr1), rtol=1e-6)

    # the topk A/B path (apply + candidate merge) agrees too
    ev_ab = S.make_sharded_eval_step(model, mesh, cutoff=20,
                                     rank_method="topk")
    hit2, mrr2, _ = ev_ab(params, state, placed)
    assert float(hit2) == float(hit)
    np.testing.assert_allclose(float(mrr2), float(mrr), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_eval_counting_collective_bytes():
    """The counting mesh eval must move fewer collective bytes than the
    apply + candidate-merge path, and must not materialise catalog-sized
    per-example tensors: its collectives are O(B)-sized psums (the
    apply path all-gathers k*mp candidates per example AND pays the
    log-softmax's cross-shard reductions)."""
    from tests.test_zero_opt import collective_bytes
    from sessionrec_tpu.models import MSGIFSR
    model = MSGIFSR(num_items=NUM_ITEMS, embedding_dim=32, num_layers=1,
                    order=2, extra=True, fusion=True, feat_drop=0.0)
    mesh = M.make_mesh(data=4, model=2)
    tx = make_optimizer(model.init(jax.random.PRNGKey(0))[0], 1e-3, 1e-4, 10)
    params, state, _ = S.init_sharded(model, tx, mesh, jax.random.PRNGKey(2))
    batch = S.place_batch(mesh, _ccs_batch(order=2))

    def compiled_bytes(rank_method):
        ev = S.make_sharded_eval_step(model, mesh, cutoff=20,
                                      rank_method=rank_method)
        hlo = ev.lower(params, state, batch).compile().as_text()
        b, shapes = collective_bytes(hlo)
        return sum(b.values()), shapes

    count_bytes, count_shapes = compiled_bytes(None)
    topk_bytes, _ = compiled_bytes("topk")
    assert count_bytes < topk_bytes, (count_bytes, topk_bytes, count_shapes)
