"""ZeRO layout for the embedding table: the backward reduce-scatters the
table gradient over the data axis (instead of all-reducing it) and the
table's Adam moments shard over both mesh axes.  Verified on the compiled
HLO of the mesh train step: a reduce-scatter exists, and total collective
bytes drop vs. the forced all-reduce layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessionrec_tpu.parallel import mesh as M
from sessionrec_tpu.parallel import sharded as S

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")

# parsing lives in the package (shared with scripts/project_scaling.py
# and test_sharded_lookup.py); re-exported here for compatibility
from sessionrec_tpu.utils.hlo import (_COLL_RE, _DTYPE_BYTES,  # noqa: F401
                                      _SHAPE_RE, collective_bytes,
                                      collective_ops, unwrap as _unwrap)


def _compiled_train_step(mesh):
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import SessionGraphBatch
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import make_train_step

    num_items = 1000
    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(0, num_items, size=rng.integers(2, 9)))
            for _ in range(16)]
    labels = list(rng.integers(0, num_items, size=16))
    batch = SessionGraphBatch(
        **builders.build_session_batch(seqs, labels, 8, 16))

    model = NISER(num_items=num_items, embedding_dim=64, num_layers=1,
                  feat_drop=0.0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-2, weight_decay=1e-4,
                        steps_per_epoch=10)
    params, state, opt_state = S.init_sharded(model, tx, mesh,
                                              jax.random.PRNGKey(0))
    batch = S.place_batch(mesh, batch)
    step = make_train_step(model, tx, fused=True, mesh=mesh)
    lowered = step.lower(params, state, opt_state, batch,
                         jax.random.PRNGKey(1))
    return lowered.compile().as_text()


def test_table_grad_reduce_scatter(monkeypatch):
    """ZeRO table layout: the [P/mp, D] table-grad all-reduce over data
    is replaced by a reduce-scatter (1/dp the result bytes) + one
    all-gather of the *update*.  On a ring that is the same wire volume
    as the all-reduce — the wins are the dp-fold smaller Adam moments and
    the de-duplicated per-replica update math — but the HLO must show the
    layout actually changed: a table-sized reduce-scatter exists and the
    all-reduce no longer carries the table."""
    # NISER dim 64, 1000 items -> padded table [1024, 64] f32, [512, 64]
    # per model shard = 131072 bytes
    table_shard_bytes = 512 * 64 * 4
    mesh = M.make_mesh(data=4, model=2)
    hlo_scatter = _compiled_train_step(mesh)

    # force the old all-reduce layout for comparison
    from jax.sharding import PartitionSpec as P
    monkeypatch.setattr(
        S, "_table_grad_layout",
        lambda mesh, table: (False, P(M.MODEL_AXIS, None)))
    hlo_psum = _compiled_train_step(mesh)

    b_scatter, shapes_s = collective_bytes(hlo_scatter)
    b_psum, _ = collective_bytes(hlo_psum)
    # table-sized reduce-scatter present (result = 1/dp of the shard)
    assert b_scatter.get("reduce-scatter", 0) >= table_shard_bytes // 4, \
        (b_scatter, shapes_s)
    # the all-reduce lost the table: its result bytes drop by >= the
    # table shard
    assert b_psum.get("all-reduce", 0) - b_scatter.get("all-reduce", 0) \
        >= table_shard_bytes, (b_scatter, b_psum)


def test_moments_sharded_over_both_axes():
    mesh = M.make_mesh(data=4, model=2)
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.train.optim import make_optimizer

    model = NISER(num_items=1000, embedding_dim=64, num_layers=1)
    params, _ = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-2, weight_decay=1e-4,
                        steps_per_epoch=10)
    params = S.place_params(mesh, params)
    opt_state = S.init_opt_state(mesh, tx, params)
    # find the adam mu leaf for the embedding
    mus = [x for path, x in jax.tree_util.tree_leaves_with_path(opt_state)
           if any(getattr(e, "key", getattr(e, "name", "")) == "embedding"
                  for e in path) and getattr(x, "ndim", 0) == 2]
    assert mus, "no embedding moment leaves found"
    for mu in mus:
        shard_rows = next(iter(mu.addressable_shards)).data.shape[0]
        assert shard_rows == mu.shape[0] // 8, (shard_rows, mu.shape)

def _compiled_bf16_train_step(mesh):
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import SessionGraphBatch
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import make_train_step

    num_items = 1000
    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(0, num_items, size=rng.integers(2, 9)))
            for _ in range(16)]
    labels = list(rng.integers(0, num_items, size=16))
    batch = SessionGraphBatch(
        **builders.build_session_batch(seqs, labels, 8, 16))

    model = NISER(num_items=num_items, embedding_dim=64, num_layers=1,
                  feat_drop=0.0, table_dtype="bfloat16")
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-2, weight_decay=1e-4,
                        steps_per_epoch=10)
    params, state, opt_state = S.init_sharded(model, tx, mesh,
                                              jax.random.PRNGKey(0))
    batch = S.place_batch(mesh, batch)
    step = make_train_step(model, tx, fused=True, mesh=mesh)
    lowered = step.lower(params, state, opt_state, batch,
                         jax.random.PRNGKey(1))
    return lowered.compile().as_text()


def test_bf16_table_allgather_bytes():
    """With a bf16 table the per-shard stochastic rounding runs BEFORE
    the data-axis gather of the updated table
    (runner._sharded_bf16_table_update), so the step's largest
    collective rides bf16: no f32 all-gather at table scale may remain,
    and a bf16 table-scale all-gather must exist."""
    # padded table [1024, 64]; per (model,data) shard rows = 1024/8 = 128
    table_shard_rows = 1024 // 8
    mesh = M.make_mesh(data=4, model=2)
    hlo = _compiled_bf16_train_step(mesh)
    _, shapes = collective_bytes(hlo)
    ag = shapes.get("all-gather", [])

    def sized(dt):
        # any gather whose result covers the model shard's full rows
        # ([512, 64] here) — batch-side gathers are far smaller
        n_min = table_shard_rows * 4 * 64
        out = []
        for s in ag:
            if not s.startswith(dt + "["):
                continue
            dims = s[len(dt) + 1:-1].split(",")
            n = 1
            for d in dims:
                if d:
                    n *= int(d)
            if n >= n_min:
                out.append(s)
        return out

    # the rounded table gathers as its uint16 bit patterns (gathering
    # bf16 VALUES loses to XLA re-hoisting the convert, ops/sround.py)
    assert sized("u16") or sized("bf16"), \
        ("no table-scale 2-byte all-gather", ag)
    assert not sized("f32"), ("table-scale f32 all-gather survived", ag)
