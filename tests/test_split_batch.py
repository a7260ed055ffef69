"""Length-bucketed (SplitBatch) batches: metric/loss parity with the
single-bucket build.

The split batch holds exactly the same example set as the unsplit batch
(graph/batch.py:SplitBatch), so training losses, gradients and eval
ranks must match the unsplit path — exactly for the BN-free models, and
to float-summation tolerance for LESSR, whose BatchNorm statistics are
computed jointly across the two sub-blocks (models/lessr.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu.data.loader import BatchLoader
from sessionrec_tpu.graph.batch import SplitBatch, flatten_blocks
from sessionrec_tpu.models import LESSR, MSGIFSR, NISER, SRGNN
from sessionrec_tpu.train import runner as R


def _sessions(n=40, num_items=60, max_len=13, seed=0):
    rng = np.random.default_rng(seed)
    # skew lengths short (the real prefix distribution is short-heavy)
    lens = np.minimum(rng.geometric(0.35, size=n) + 1, max_len)
    return [list(rng.integers(0, num_items, size=l)) for l in lens]


def _loaders(kind, order=1, batch_size=16, split_len=6, shuffle=False):
    sessions = _sessions()
    kw = dict(shuffle=shuffle, order=order, prefetch=0, use_native=False)
    plain = BatchLoader(sessions, kind, batch_size, 12, **kw)
    split = BatchLoader(sessions, kind, batch_size, 12, split_len=split_len,
                        **kw)
    return plain, split


def _perm(plain_batch_ids, lens, split_len):
    """Row permutation the split applies: shorts first, longs after."""
    short = [i for i in plain_batch_ids if lens[i] <= split_len]
    long = [i for i in plain_batch_ids if lens[i] > split_len]
    return short + long


def _rows(batch):
    """(label, node-count) multiset of one leaf block."""
    v = np.asarray(batch.valid).astype(bool)
    lbl = np.asarray(batch.labels)[v]
    ln = np.asarray(batch.node_mask).sum(1)[v]
    return sorted(zip(lbl.tolist(), ln.tolist()))


def test_loader_split_invariants():
    plain, split = _loaders("session")
    assert split.split is not None
    (sl,), (cs, cl) = split.split
    assert sl == 6 and cs % 8 == 0 and cl % 8 == 0
    n_plain = n_split = 0
    for pb, sb in zip(plain, split):
        assert isinstance(sb, SplitBatch)
        # same example set: the (sorted) multiset of (label, len) pairs
        got = sorted(_rows(sb.short) + _rows(sb.long))
        assert got == _rows(pb)
        # short block really is capped short
        assert np.asarray(sb.short.node_mask).shape[1] == sl
        n_plain += int(np.asarray(pb.valid).sum())
        n_split += int(np.asarray(sb.valid).sum())
    assert n_plain == n_split == plain.num_examples


def test_loader_three_tier_invariants():
    """split_len as a threshold list builds a NESTED SplitBatch whose
    leaf tiers partition the batch by length at per-tier node caps."""
    plain, split = _loaders("session", split_len=(3, 6))
    thresholds, caps = split.split
    assert thresholds == (3, 6) and len(caps) == 3
    for pb, sb in zip(plain, split):
        leaves = flatten_blocks(sb)
        assert len(leaves) == 3
        assert [np.asarray(b.node_mask).shape[1] for b in leaves] \
            == [3, 6, 12]
        got = sorted(sum((_rows(b) for b in leaves), []))
        assert got == _rows(pb)
        # tiers really partition by length
        for b, hi in zip(leaves, (3, 6, 12)):
            v = np.asarray(b.valid).astype(bool)
            assert (np.asarray(b.node_mask).sum(1)[v] <= hi).all()


def test_loader_split_shuffled_caps_cover_epochs():
    plain, split = _loaders("session", shuffle=True)
    for epoch in range(6):
        split.set_epoch(epoch)
        for sb in split:   # would raise on sub-block overflow
            pass


@pytest.mark.parametrize("name,model,kind,order", [
    ("srgnn", SRGNN(num_items=60, embedding_dim=16, num_layers=1,
                    feat_drop=0.0), "session", 1),
    ("niser", NISER(num_items=60, embedding_dim=16, num_layers=1,
                    feat_drop=0.0), "session", 1),
    ("msgifsr-o1", MSGIFSR(num_items=60, embedding_dim=16, num_layers=1,
                           order=1, feat_drop=0.0), "ccs", 1),
    pytest.param("msgifsr-o3",
                 MSGIFSR(num_items=60, embedding_dim=16, num_layers=1,
                         order=3, extra=True, fusion=True, feat_drop=0.0),
                 "ccs", 3, marks=pytest.mark.slow),
    pytest.param("lessr",
                 LESSR(num_items=60, embedding_dim=16, num_layers=3,
                       batch_norm=True, feat_drop=0.0), "lessr", 1,
                 marks=pytest.mark.slow),
])
@pytest.mark.parametrize("split_len", [6, (3, 6)])
def test_split_train_loss_and_grads_match(name, model, kind, order,
                                          split_len):
    """Per-batch training loss and embedding gradient match the unsplit
    path (exact example set; LESSR joint-BN makes its stats identical
    up to float summation order) — for both the two-tier and the nested
    three-tier split."""
    plain, split = _loaders(kind, order=order, split_len=split_len)
    params, state = model.init(jax.random.PRNGKey(0))
    params = model.project_params(params)
    rng = jax.random.PRNGKey(7)

    for pb, sb in zip(plain, split):
        def loss_of(batch):
            loss_fn = R.make_loss_fn(model, state, batch, rng)
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, grads, new_state

        lp, gp, nsp = jax.jit(lambda b: loss_of(b))(pb)
        ls, gs, nss = jax.jit(lambda b: loss_of(b))(sb)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lp),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gs["embedding"]),
                                   np.asarray(gp["embedding"]),
                                   rtol=5e-4, atol=2e-6)
        # BN running-state updates must match too (LESSR)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            nss, nsp)


@pytest.mark.parametrize("name,model,kind,order", [
    ("niser", NISER(num_items=60, embedding_dim=16, num_layers=1,
                    feat_drop=0.0), "session", 1),
    pytest.param("msgifsr-o3",
                 MSGIFSR(num_items=60, embedding_dim=16, num_layers=1,
                         order=3, extra=True, fusion=True, feat_drop=0.0),
                 "ccs", 3, marks=pytest.mark.slow),
    ("lessr", LESSR(num_items=60, embedding_dim=16, num_layers=3,
                    batch_norm=True, feat_drop=0.0), "lessr", 1),
])
@pytest.mark.parametrize("split_len", [6, (3, 6)])
def test_split_eval_ranks_match(name, model, kind, order, split_len):
    """Eval label ranks are identical per example (eval-mode BN uses
    running stats, so even LESSR is exact up to the row permutation)."""
    sessions = _sessions()
    plain, split = _loaders(kind, order=order, split_len=split_len)
    params, state = model.init(jax.random.PRNGKey(1))
    params = model.project_params(params)

    lens = None  # per-batch example lengths come from the plain batch
    for pb, sb in zip(plain, split):
        rp = jax.jit(lambda b: R._eval_ranks(model, params, state, b, 20))(pb)
        rs = jax.jit(lambda b: R._eval_ranks(model, params, state, b, 20))(sb)
        vp = np.asarray(pb.valid).astype(bool)
        vs = np.asarray(sb.valid).astype(bool)
        # ranks as multisets keyed by label (row order permutes)
        a = sorted(zip(np.asarray(pb.labels)[vp].tolist(),
                       np.asarray(rp)[vp].tolist()))
        b = sorted(zip(np.asarray(sb.labels)[vs].tolist(),
                       np.asarray(rs)[vs].tolist()))
        assert a == b


@pytest.mark.slow
def test_split_unrolled_runner_end_to_end():
    """Full TrainRunner (stacked lax.scan chunks, eval sweeps) with split
    loaders reproduces the unsplit run's metrics."""
    model = MSGIFSR(num_items=60, embedding_dim=16, num_layers=1,
                    order=2, extra=True, fusion=True, feat_drop=0.0)
    sessions = _sessions(n=60)
    results = []
    for split_len in (None, 6):
        train = BatchLoader(sessions, "ccs", 16, 12, order=2, prefetch=0,
                            use_native=False, split_len=split_len)
        test = BatchLoader(sessions[:20], "ccs", 16, 12, order=2, prefetch=0,
                           use_native=False, split_len=split_len)
        runner = R.TrainRunner(model, train, test, seed=5, unroll=4,
                               eval_before_train=False)
        results.append(runner.train(2, log_interval=100))
        # no recompile storm: the split caps are static, so two epochs
        # compile exactly one fast-path train program (the guarded tail
        # variant is a separate jitted fn) and one eval program
        assert runner.train_step._cache_size() == 1
        assert runner.train_step_guarded._cache_size() <= 1
        assert runner.eval_step._cache_size() == 1
    (mrr_a, hit_a), (mrr_b, hit_b) = results
    assert abs(mrr_a - mrr_b) < 5e-3
    assert abs(hit_a - hit_b) < 5e-3


@pytest.mark.skipif(len(jax.__dict__) and len(jax.devices()) < 8,
                    reason="needs 8 devices")
def test_split_mesh_train_and_eval_match_single_device():
    """Mesh + SplitBatch: the per-shard row joins (shard_concat_rows)
    must reproduce the single-device split loss and eval metrics."""
    from sessionrec_tpu.parallel import sharded as S
    from sessionrec_tpu.parallel.mesh import make_mesh
    from sessionrec_tpu.train.optim import make_optimizer

    model = MSGIFSR(num_items=60, embedding_dim=16, num_layers=1,
                    order=2, extra=True, fusion=True, feat_drop=0.0)
    # caps must divide dp=4: batch 32 -> mult 8 caps.  Three tiers: the
    # mesh row joins flatten the nested SplitBatch
    # (parallel/sharded.py:split_head_multi_sharded)
    sessions = _sessions(n=60)
    loader = BatchLoader(sessions, "ccs", 32, 12, order=2, prefetch=0,
                         use_native=False, split_len=(3, 6))
    batch = next(iter(loader))
    params, state = model.init(jax.random.PRNGKey(2))
    params = model.project_params(params)

    # single-device loss + eval
    loss_fn = R.make_loss_fn(model, state, batch, None)
    loss1, _ = jax.jit(lambda p: loss_fn(p))(params)
    ev1 = R.make_eval_step(model, cutoff=20)
    h1, m1, n1 = ev1(params, state, batch)

    mesh = make_mesh(data=4, model=2)
    tx = make_optimizer(params, 1e-3, 1e-4, 10)
    p2, s2, _ = S.init_sharded(model, tx, mesh, jax.random.PRNGKey(2))
    p2 = jax.jit(model.project_params)(p2)
    b2 = S.place_batch(mesh, batch)

    def mesh_loss(p):
        return R.make_loss_fn(model, s2, b2, None, mesh=mesh)(p)
    loss2, _ = jax.jit(mesh_loss)(p2)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=2e-5)

    ev2 = S.make_sharded_eval_step(model, mesh, cutoff=20)
    h2, m2, n2 = ev2(p2, s2, b2)
    assert float(n2) == float(n1)
    assert float(h2) == float(h1)
    np.testing.assert_allclose(float(m2), float(m1), rtol=1e-6)
