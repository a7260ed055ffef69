"""Explicit shard_map'd embedding lookup (parallel/lookup.py).

Left to GSPMD, the mesh gather's backward all-gathers the per-example
gradient rows over ``data`` (54.6 MB f32 per step on the split-batch
step at dp=8/mp=2 — BENCH_NOTES round 5).  The explicit path must be
bit-identical forward, numerically equal backward, and the compiled
split train step must have lost the batch-sized f32 all-gathers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sessionrec_tpu.parallel import mesh as M
from sessionrec_tpu.parallel.lookup import _dense_lookup, sharded_lookup

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _mesh():
    return M.make_mesh(data=4, model=2)


def _place(mesh, table, ids):
    return (jax.device_put(table, NamedSharding(mesh, P("model", None))),
            jax.device_put(ids, NamedSharding(
                mesh, P("data", *([None] * (ids.ndim - 1))))))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_bitwise(dtype):
    """Masked local gather + psum over model: exactly one shard
    contributes a nonzero row per id, so even the bf16 psum is exact."""
    mesh = _mesh()
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(256, 32)), dtype=dtype)
    ids = jnp.asarray(rng.integers(0, 256, size=(16, 5, 3)), jnp.int32)
    tab_s, ids_s = _place(mesh, table, ids)
    out = jax.jit(lambda t, i: _dense_lookup(mesh, t, i))(tab_s, ids_s)
    ref = table[ids]
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_backward_matches_plain_gather(dtype):
    """Dense scatter-add + data reduce == autodiff of the plain gather
    (scatter accumulation order may differ -> allclose, tight for f32;
    the bf16 path rounds the reduced cotangent to bf16 like the primal
    dtype demands, so compare at bf16 resolution)."""
    mesh = _mesh()
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(256, 32)), dtype=dtype)
    # duplicates guaranteed: ids drawn from a small range
    ids = jnp.asarray(rng.integers(0, 64, size=(16, 7)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(16, 7, 32)), jnp.float32)
    tab_s, ids_s = _place(mesh, table, ids)

    g_mesh = jax.jit(jax.grad(
        lambda t: jnp.sum(_dense_lookup(mesh, t, ids_s)
                          .astype(jnp.float32) * w)))(tab_s)
    g_ref = jax.jit(jax.grad(
        lambda t: jnp.sum(t[ids].astype(jnp.float32) * w)))(table)
    assert g_mesh.dtype == table.dtype
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 \
        else dict(rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_mesh, np.float32),
                               np.asarray(g_ref, np.float32), **tol)


def test_fallback_predicate():
    """Only STRUCTURAL fallbacks remain (a size-based one shipped
    briefly and only ever lost bytes — the dense grads merge into the
    CE table reduction for free, see module docstring): ids whose batch
    axis doesn't divide the data axis use the plain gather (no psum, so
    running UNSHARDED works), everything else goes dense."""
    mesh = _mesh()
    table = jnp.zeros((1 << 16, 16))
    ids = jnp.zeros((7, 2), jnp.int32)       # 7 % dp(4) != 0 -> fallback
    out = sharded_lookup(mesh, table, ids)   # unsharded operands OK
    assert out.shape == (7, 2, 16)
    # divisible shapes engage the dense path even for tiny id blocks
    small = jnp.zeros((256, 16))
    ids8 = jnp.zeros((8, 2), jnp.int32)
    tab_s, ids_s = _place(mesh, small, ids8)
    out = jax.jit(lambda t, i: sharded_lookup(mesh, t, i))(tab_s, ids_s)
    assert out.shape == (8, 2, 16)


def _compiled_split_step(mesh, num_items=4096, dim=64):
    """Split-batch NISER train step HLO at a geometry where the dense
    lookup engages (ids.size > ploc * itemsize/4).  Lowers ABSTRACTLY
    (ShapeDtypeStructs + shardings, no arrays placed) so the same helper
    compiles against the CPU test mesh and AOT TPU topologies."""
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import SessionGraphBatch, SplitBatch
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import make_train_step

    rng = np.random.default_rng(0)

    def mk(n, max_len, size):
        seqs = [list(rng.integers(0, num_items,
                                  size=rng.integers(2, max_len + 1)))
                for _ in range(n)]
        labels = list(rng.integers(0, num_items, size=n))
        return SessionGraphBatch(
            **builders.build_session_batch(seqs, labels, max_len, size))

    batch = SplitBatch(short=mk(32, 8, 512), long=mk(8, 20, 128))
    model = NISER(num_items=num_items, embedding_dim=dim, num_layers=1,
                  feat_drop=0.0, table_dtype="bfloat16")
    tx = make_optimizer(model.init(jax.random.PRNGKey(0))[0], lr=1e-2,
                        weight_decay=1e-4, steps_per_epoch=10)
    step = make_train_step(model, tx, fused=True, mesh=mesh)
    from sessionrec_tpu.parallel.sharded import abstract_step_operands
    ops = abstract_step_operands(mesh, model, tx, batch)
    return step.lower(*ops).compile().as_text()


def _size_of(s):
    dt, dims = s.split("[")
    n = 1
    for x in dims[:-1].split(","):
        if x:
            n *= int(x)
    return n * (2 if dt in ("bf16", "u16", "s16", "f16") else 4)


def test_split_step_has_no_batch_f32_allgathers():
    """The compiled split train step must not all-gather batch-sized f32
    lookup gradients over data any more: every remaining f32 all-gather
    stays below the smaller block's gradient size, and the lookup
    backward's dense table-shard reduce-scatters exist (one per CE +
    one per lookup site).  Wire DTYPE is asserted separately on TPU AOT
    HLO (test_lookup_grads_reduce_bf16_on_tpu): the CPU backend
    promotes bf16 reduction collectives to f32 — a backend artifact the
    u16-bits trick can't dodge for reductions (they add)."""
    from test_zero_opt import collective_bytes
    mesh = _mesh()
    hlo = _compiled_split_step(mesh)
    _, shapes = collective_bytes(hlo)

    # smaller block's lookup grad: [128, 20, d] f32 with global B=128
    block_grad_bytes = 128 * 20 * 64 * 4
    f32_ags = [s for s in shapes.get("all-gather", [])
               if s.startswith("f32[") and _size_of(s) >= block_grad_bytes]
    assert not f32_ags, f32_ags
    # three dense table-shard reductions: fused-CE dtab + 2 lookup sites
    shard_rows = 4096 // 8
    rs = [s for s in shapes.get("reduce-scatter", [])
          if _size_of(s) >= shard_rows * 64 * 2]
    assert len(rs) >= 3, shapes


def test_lookup_grads_reduce_bf16_on_tpu():
    """On real TPU HLO (AOT-compiled against a v5e topology — no
    hardware needed) the lookup backward's table-grad reductions ride
    bf16, as coded: the f32 seen in the CPU-mesh HLO is backend
    promotion, not our schedule."""
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:4x4")
        devs = list(topo.devices)
    except Exception as e:                          # pragma: no cover
        pytest.skip(f"TPU topology unavailable: {e}")
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("data", "model"))
    from test_zero_opt import collective_bytes
    hlo = _compiled_split_step(mesh)
    _, shapes = collective_bytes(hlo)
    shard_rows = 4096 // 8
    bf16_rs = [s for k in ("reduce-scatter", "all-reduce")
               for s in shapes.get(k, [])
               if s.startswith("bf16[") and _size_of(s) >= shard_rows * 64]
    assert len(bf16_rs) >= 2, shapes
    # and no f32 reduction at lookup-grad scale beyond the CE one
    f32_rs = [s for k in ("reduce-scatter", "all-reduce")
              for s in shapes.get(k, [])
              if s.startswith("f32[") and _size_of(s) >= shard_rows * 64 * 2]
    assert len(f32_rs) <= 2, shapes
