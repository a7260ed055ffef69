"""Explicit shard_map'd embedding lookup for the (data, model) mesh.

``table[ids]`` with the table row-sharded over ``model`` and ``ids``
sharded over ``data`` is a cross-shard gather.  Left to GSPMD, the
forward is fine (masked local gather + all-reduce over ``model``) but it
re-widens the wire to f32 even for bf16 tables, and the BACKWARD
replicates the per-example gradient rows over ``data`` — measured on the
split-batch mesh step at dp=8/mp=2, **54.6 MB of global-batch f32
all-gathers per step** (f32[4096,8,1,256] + f32[1024,20,1,256] + the
s32 index gathers; BENCH_NOTES round 5), the largest collective family
of the step.

The explicit path pins both sides:

* forward: each model shard gathers the rows it owns (ids offset into
  the local range, out-of-range rows zeroed) and one ``psum`` over
  ``model`` assembles them — in the TABLE dtype.  Exactly one shard
  contributes a non-zero row per id, so a bf16 psum is bit-exact
  (x + 0 == x) and moves half the bytes GSPMD's f32 all-reduce did.
* backward: each (data, model) device scatter-adds its data chunk's
  cotangent rows into a DENSE ``[rows/mp, d]`` f32 buffer for its model
  shard, casts to the table dtype, and the buffers reduce over ``data``
  with the same ZeRO layout as the fused-CE table gradient
  (``sharded._table_grad_layout``: reduce-scatter when the per-shard
  rows divide dp, psum otherwise).  No batch-sized tensor crosses the
  wire.

Dense looks expensive in isolation (a ``[rows/mp, d]`` buffer per
site vs GSPMD's sparse ``ids.size * d`` update gather — far smaller at
serving-scale catalogs), but in TRAINING the fused CE loss already
reduces a dense table gradient every step, and XLA merges same-shaped
reductions: measured on TPU-AOT HLO at BOTH geometries, the dense
lookup cotangents fold into that existing collective for ZERO marginal
wire (o1/37k: three reduce-scatters merged into one bf16
``[2336,256]``; niser-1m/2^20: the 68.7 MB table all-reduce unchanged
while 10.8 MB of update/id gathers disappear).  A size-based fallback
(shipped briefly) therefore only ever LOST bytes — e.g. the (4, 8)
tier blocks whose ids are individually small fell back and re-grew
5-7 MB of gathers per step — so the only remaining fallbacks are
structural (single data shard, non-divisible shapes).  Byte-count
evidence: ``tests/test_sharded_lookup.py``, BENCH_NOTES round 5.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sessionrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def sharded_lookup(mesh, table, ids):
    """``table[ids]`` over the mesh (see module docstring).

    ``table [rows, d]`` row-sharded over ``model``; ``ids [B, ...]``
    (any rank >= 1) sharded over ``data`` on axis 0.  Returns
    ``[B, ..., d]`` data-sharded rows in the table dtype.  Falls back to
    the plain gather only when the explicit path's structural
    preconditions don't hold (single data shard, shapes that don't
    divide the mesh).
    """
    dp = mesh.shape[DATA_AXIS]
    mp = mesh.shape[MODEL_AXIS]
    if (dp <= 1 or ids.ndim < 1 or ids.shape[0] % dp
            or table.shape[0] % mp):
        return table[ids]
    return _dense_lookup(mesh, table, ids)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dense_lookup(mesh, table, ids):
    out, _ = _dense_lookup_fwd(mesh, table, ids)
    return out


def _id_spec(ids):
    return P(DATA_AXIS, *([None] * (ids.ndim - 1)))


def _dense_lookup_fwd(mesh, table, ids):
    mp = mesh.shape[MODEL_AXIS]
    ploc = table.shape[0] // mp

    def local(tab, idl):
        shard = jax.lax.axis_index(MODEL_AXIS)
        lid = idl.astype(jnp.int32) - shard * ploc
        ok = (lid >= 0) & (lid < ploc)
        rows = tab[jnp.clip(lid, 0, ploc - 1)]
        rows = jnp.where(ok[..., None], rows, jnp.zeros((), tab.dtype))
        # barrier: downstream f32 consumers must not pull their convert
        # INTO the collective (XLA re-widened the psum to f32 without it)
        return jax.lax.optimization_barrier(jax.lax.psum(rows, MODEL_AXIS))

    out = shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), _id_spec(ids)),
        out_specs=P(DATA_AXIS, *([None] * ids.ndim)),
        check_vma=False,
    )(table, ids)
    return out, (table, ids)


def _dense_lookup_bwd(mesh, res, g):
    table, ids = res
    # lazy import: sharded.py imports runner; resolving the layout helper
    # at call time keeps the import graph acyclic AND picks up test
    # monkeypatches of sharded._table_grad_layout
    from sessionrec_tpu.parallel import sharded as S
    mp = mesh.shape[MODEL_AXIS]
    ploc = table.shape[0] // mp
    d = table.shape[1]
    scatter, tab_spec = S._table_grad_layout(mesh, table)

    def local(idl, gl):
        shard = jax.lax.axis_index(MODEL_AXIS)
        lid = idl.astype(jnp.int32) - shard * ploc
        ok = (lid >= 0) & (lid < ploc)
        g32 = jnp.where(ok[..., None], gl.astype(jnp.float32), 0.0)
        dtab = jnp.zeros((ploc, d), jnp.float32).at[
            jnp.clip(lid, 0, ploc - 1).reshape(-1)
        ].add(g32.reshape(-1, d))
        # reduce over data in the TABLE dtype: the summed cotangent is
        # cast to it anyway (custom_vjp output dtype == primal dtype),
        # and for bf16 tables this halves the ring bytes.  The barrier
        # keeps XLA from deferring the cast until after the collective
        # (which re-widens the wire to f32 — same failure mode as the
        # round-4 table gather, runner._sharded_bf16_table_update).
        dtab = jax.lax.optimization_barrier(dtab.astype(table.dtype))
        return S._reduce_table_grad(dtab, scatter)

    dtab = shard_map(
        local, mesh=mesh,
        in_specs=(_id_spec(ids), P(DATA_AXIS, *([None] * ids.ndim))),
        out_specs=tab_spec,
        check_vma=False,
    )(ids, g)
    return dtab, np.zeros(ids.shape, dtype=jax.dtypes.float0)


_dense_lookup.defvjp(_dense_lookup_fwd, _dense_lookup_bwd)
