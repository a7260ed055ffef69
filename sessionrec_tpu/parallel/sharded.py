"""Sharded train/eval steps over a (data, model) mesh.

GSPMD strategy: parameters and batches are placed with explicit
``NamedSharding``s (mesh.py) and the *same* pure step functions used
single-chip are jit-compiled against them; XLA inserts the collectives —
grad psum over ``data``, all-gather/psum for the row-sharded embedding
lookups and the column-sharded catalog softmax.  ``sharded_topk`` is a
hand-written shard_map fast path for distributed top-k: local
``lax.top_k`` per catalog shard, then a tiny all-gather of k candidates
per shard and a final top-k — instead of all-gathering the whole
``[B, num_items]`` logits row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from sessionrec_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                          batch_sharding, param_sharding)
from sessionrec_tpu.ops import scoring, xent
from sessionrec_tpu.train.runner import make_eval_step, make_train_step


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_loss_mesh(mesh, scale, num_items, normalize_table,
                     sr, table, labels, valid):
    loss, _ = _fused_loss_mesh_fwd(mesh, scale, num_items, normalize_table,
                                   sr, table, labels, valid)
    return loss


def _fused_loss_mesh_fwd(mesh, scale, num_items, normalize_table,
                         sr, table, labels, valid):
    def local(sr, table_local, labels, valid):
        per_row, lse = xent.sharded_xent_fwd(
            sr, table_local, labels, scale=scale, num_items=num_items,
            normalize_table=normalize_table, axis_name=MODEL_AXIS)
        v = valid.astype(per_row.dtype)
        num = jax.lax.psum(jnp.sum(per_row * v), DATA_AXIS)
        den = jax.lax.psum(jnp.sum(v), DATA_AXIS)
        return num / jnp.maximum(den, 1.0), lse, jnp.maximum(den, 1.0)

    loss, lse, den = shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(MODEL_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=(P(), P(DATA_AXIS), P()),
        check_vma=False,
    )(sr, table, labels, valid)
    return loss, (sr, table, labels, valid, lse, den)


def _fused_loss_mesh_bwd(mesh, scale, num_items, normalize_table, res, g):
    sr, table, labels, valid, lse, den = res

    def local(sr, table_local, labels, valid, lse):
        # cotangent of each per-row loss under the masked global mean
        g_row = g * valid.astype(jnp.float32) / den
        dsr, dtab = xent.sharded_xent_bwd(
            g_row, sr, table_local, labels, lse, scale=scale,
            num_items=num_items, normalize_table=normalize_table,
            axis_name=MODEL_AXIS)
        # every data shard contributes to every table row
        dtab = jax.lax.psum(dtab, DATA_AXIS)
        return dsr, dtab

    dsr, dtab = shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(MODEL_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, None), P(MODEL_AXIS, None)),
        check_vma=False,
    )(sr, table, labels, valid, lse)
    return dsr, dtab.astype(table.dtype), None, None


_fused_loss_mesh.defvjp(_fused_loss_mesh_fwd, _fused_loss_mesh_bwd)


def fused_nll_loss_sharded(mesh, sr, table, labels, valid, *, scale: float,
                           num_items: int, normalize_table: bool = False):
    """Mesh version of ``ops.xent.fused_nll_loss``: flash softmax-CE with
    the catalog table row-sharded over ``model`` and the batch sharded
    over ``data``.  Each model shard streams only its table rows through
    the Pallas kernel; per-shard (max, sum-exp, label-logit) stats merge
    with tiny [B] collectives (SURVEY.md §7.3 hard part 4).

    Forward and backward are *separate* shard_maps under one mesh-level
    ``custom_vjp``: differentiating through a ``check_vma=False``
    shard_map mis-scales cotangents of replicated/sharded inputs (the
    transpose seeds replicated outputs with a 1/axis-size convention),
    so the backward collectives are written out explicitly instead.
    """
    return _fused_loss_mesh(mesh, float(scale), int(num_items),
                            bool(normalize_table), sr, table, labels, valid)


def place_params(mesh, params):
    return jax.device_put(params, param_sharding(mesh, params))


def place_batch(mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh, batch))


def init_sharded(model, tx, mesh, key):
    """Init params/state/opt_state with proper placement."""
    params, state = model.init(key)
    params = place_params(mesh, params)
    state = jax.device_put(state, jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), state))
    opt_state = jax.jit(tx.init)(params)   # moments inherit param sharding
    return params, state, opt_state


def make_sharded_steps(model, tx, mesh, cutoff=20):
    """(train_step, eval_step) compiled against the mesh.

    The bodies are identical to the single-chip ones — sharding is
    carried entirely by operand placement (GSPMD).
    """
    train_step = make_train_step(model, tx, mesh=mesh)
    eval_step = make_eval_step(model, cutoff)
    return train_step, eval_step


def sharded_topk(mesh, log_probs, k: int):
    """Distributed top-k over catalog-sharded scores.

    ``log_probs [B, P]`` sharded (data, model).  Per model-shard: local
    ``lax.top_k`` -> (values, global ids); all-gather the k candidates of
    each shard over ``model`` (k * n_shards tiny rows, rides ICI) and
    re-top-k.  Returns global (values, indices) replicated over model.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def local(lp):
        shard = jax.lax.axis_index(MODEL_AXIS)
        p_local = lp.shape[-1]
        v, i = jax.lax.top_k(lp, k)
        gi = i + shard * p_local
        vg = jax.lax.all_gather(v, MODEL_AXIS, axis=-1, tiled=True)
        ig = jax.lax.all_gather(gi, MODEL_AXIS, axis=-1, tiled=True)
        v2, pos = jax.lax.top_k(vg, k)
        i2 = jnp.take_along_axis(ig, pos, axis=-1)
        return v2, i2

    return shard_map(
        local, mesh=mesh,
        in_specs=P(DATA_AXIS, MODEL_AXIS),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )(log_probs)


def _topk_metrics(mesh, log_probs, labels, valid, cutoff):
    """(hit_count, mrr_sum, n_valid) of one batch via distributed top-k."""
    log_probs = jax.lax.with_sharding_constraint(
        log_probs, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)))
    _, idx = sharded_topk(mesh, log_probs, cutoff)
    hit = idx == labels[:, None]
    rank = jnp.argmax(hit, axis=-1) + 1
    ranks = jnp.where(jnp.any(hit, axis=-1), rank, 0)
    hit_c = jnp.sum((ranks > 0) * valid)
    mrr = jnp.sum(jnp.where(ranks > 0, 1.0 / jnp.maximum(ranks, 1), 0.0)
                  * valid)
    return hit_c, mrr, jnp.sum(valid)


def make_sharded_unrolled_eval_step(model, mesh, cutoff=20):
    """Mesh counterpart of runner.make_unrolled_eval_step: scan over a
    stacked chunk of eval batches, per-batch distributed top-k over the
    catalog shards, summed (hit, mrr, n)."""

    def eval_chunk(params, state, batches):
        params = model.project_params(params)

        def one(carry, batch):
            log_probs, _ = model.apply(params, state, batch, training=False,
                                       rng=None)
            hit, mrr, n = _topk_metrics(mesh, log_probs, batch.labels,
                                        batch.valid, cutoff)
            h, m, c = carry
            return (h + hit, m + mrr, c + n), None

        zero = jnp.float32(0.0)
        (h, m, n), _ = jax.lax.scan(one, (zero, zero, zero), batches)
        return h, m, n

    return jax.jit(eval_chunk)


def make_sharded_eval_step(model, mesh, cutoff=20):
    """Eval step whose top-k uses the shard_map candidate-merge path."""

    def eval_step(params, state, batch):
        params = model.project_params(params)
        log_probs, _ = model.apply(params, state, batch, training=False,
                                   rng=None)
        return _topk_metrics(mesh, log_probs, batch.labels, batch.valid,
                             cutoff)

    return jax.jit(eval_step)
