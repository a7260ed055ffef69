"""Sharded train/eval steps over a (data, model) mesh.

GSPMD strategy: parameters and batches are placed with explicit
``NamedSharding``s (mesh.py) and the *same* pure step functions used
single-chip are jit-compiled against them; XLA inserts the collectives —
grad psum over ``data``, all-gather/psum for the row-sharded embedding
lookups and the column-sharded catalog softmax.  Distributed eval
ranking defaults to ``sharded_count_ranks`` — per-shard label-rank
counting merged by three tiny ``psum``s (see
scoring.label_ranks_by_count for the tie argument) — with
``sharded_topk`` (local ``lax.top_k`` per catalog shard + an
all-gather of k candidates per shard and a final top-k) kept as the
``rank_method="topk"`` A/B path.
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
from sessionrec_tpu.train.runner import (make_eval_step,
                                         make_train_step)


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


def _table_grad_layout(mesh, table):
    """How the table gradient leaves the backward shard_map.

    Every data shard contributes to every table row.  When the local row
    count divides the data axis we **reduce-scatter** over ``data``
    instead of psum-ing: each device keeps only ``P/(mp*dp)`` summed rows
    (ZeRO-style), halving the table's per-step collective bytes (one
    reduce-scatter of the grad + one all-gather of the *update* vs. a
    full all-reduce of the grad), and the embedding's Adam moments shard
    the same way (``opt_state_sharding``), cutting their memory by dp.
    """
    dp = mesh.shape[DATA_AXIS]
    mp = mesh.shape[MODEL_AXIS]
    scatter = (table.shape[0] // mp) % dp == 0 and dp > 1
    spec = P((MODEL_AXIS, DATA_AXIS), None) if scatter \
        else P(MODEL_AXIS, None)
    return scatter, spec


def _reduce_table_grad(dtab, scatter):
    if scatter:
        return jax.lax.psum_scatter(dtab, DATA_AXIS, scatter_dimension=0,
                                    tiled=True)
    return jax.lax.psum(dtab, DATA_AXIS)


def _fused_loss_mesh_bwd(mesh, scale, num_items, normalize_table, res, g):
    sr, table, labels, valid, lse, den = res
    scatter, tab_spec = _table_grad_layout(mesh, table)

    def local(sr, table_local, labels, valid, lse):
        # cotangent of each per-row loss under the masked global mean
        g_row = g * valid.astype(jnp.float32) / den
        dsr, dtab = xent.sharded_xent_bwd(
            g_row, sr, table_local, labels, lse, scale=scale,
            num_items=num_items, normalize_table=normalize_table,
            axis_name=MODEL_AXIS)
        # every data shard contributes to every table row
        dtab = _reduce_table_grad(dtab, scatter)
        return dsr, dtab

    dsr, dtab = shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(MODEL_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, None), tab_spec),
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


# ---------------------------------------------------------------------------
# fused MSGIFSR REnorm/fusion loss over the mesh (ops/xent_multi.py per
# catalog shard; same explicit-bwd custom_vjp structure as above)
# ---------------------------------------------------------------------------

def _merge_partial_lse(m, s, axis_name):
    """Finish a log-sum-exp from per-shard (max, relative sum-exp)."""
    m_g = jax.lax.pmax(m, axis_name)
    m_safe = jnp.maximum(m_g, xent.NEG_INF * 0.5)
    s_g = jax.lax.psum(s * jnp.exp(jnp.maximum(m, xent.NEG_INF) - m_safe),
                       axis_name)
    return m_safe + jnp.log(jnp.maximum(s_g, jnp.finfo(jnp.float32).tiny))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_multi_mesh(mesh, scale, num_items, normalize_table, extra,
                      fusion, sr, table, labels, valid, iids, phi, alpha):
    loss, _ = _fused_multi_mesh_fwd(mesh, scale, num_items, normalize_table,
                                    extra, fusion, sr, table, labels, valid,
                                    iids, phi, alpha)
    return loss


def _fused_multi_mesh_fwd(mesh, scale, num_items, normalize_table, extra,
                          fusion, sr, table, labels, valid, iids, phi,
                          alpha):
    from sessionrec_tpu.ops import xent_multi as xm
    n_sess = iids.shape[1]

    def local(sr, table_local, labels, valid, iids, phi, alpha):
        B = sr.shape[0]
        sr3 = jnp.swapaxes(sr, 0, 1)
        ploc = table_local.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = (shard * ploc).astype(jnp.int32)
        n_valid = jnp.clip(num_items - offset, 0, ploc)
        lbl_local, _ = xent._localize_labels(labels, ploc, num_items,
                                             MODEL_AXIS)
        sr3p, tabp, lblp, iidp = xm._pad_operands(
            sr3, table_local, lbl_local, iids.astype(jnp.int32))
        m_in, s_in, m_ex, s_ex, zl = xm._fwd_pallas(
            sr3p, tabp, lblp, iidp, n_valid, offset, scale=scale,
            normalize_table=normalize_table, n_sess=n_sess)
        lse_in = _merge_partial_lse(m_in, s_in, MODEL_AXIS)[:, :B]
        lse_ex = _merge_partial_lse(m_ex, s_ex, MODEL_AXIS)[:, :B]
        zl_g = jax.lax.psum(zl, MODEL_AXIS)[:, :B]
        lbl_in = jnp.any(iids == labels[:, None].astype(iids.dtype), axis=1)
        per_row = xm.combine_stats(zl_g, lse_in, lse_ex, phi, alpha, lbl_in,
                                   extra=extra, fusion=fusion)
        v = valid.astype(per_row.dtype)
        num = jax.lax.psum(jnp.sum(per_row * v), DATA_AXIS)
        den = jnp.maximum(jax.lax.psum(jnp.sum(v), DATA_AXIS), 1.0)
        return num / den, zl_g, lse_in, lse_ex, den

    loss, zl, lse_in, lse_ex, den = shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(MODEL_AXIS, None),
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS, None),
                  P(DATA_AXIS, None, None), P()),
        out_specs=(P(), P(None, DATA_AXIS), P(None, DATA_AXIS),
                   P(None, DATA_AXIS), P()),
        check_vma=False,
    )(sr, table, labels, valid, iids, phi, alpha)
    return loss, (sr, table, labels, valid, iids, phi, alpha, zl, lse_in,
                  lse_ex, den)


def _fused_multi_mesh_bwd(mesh, scale, num_items, normalize_table, extra,
                          fusion, res, g):
    from sessionrec_tpu.ops import xent_multi as xm
    (sr, table, labels, valid, iids, phi, alpha, zl, lse_in, lse_ex,
     den) = res
    n_sess = iids.shape[1]
    scatter, tab_spec = _table_grad_layout(mesh, table)

    def local(sr, table_local, labels, valid, iids, phi, alpha, zl, lse_in,
              lse_ex, den):
        B = sr.shape[0]
        lbl_in = jnp.any(iids == labels[:, None].astype(iids.dtype), axis=1)
        v = valid.astype(jnp.float32)

        def combined(zl_, lin_, lex_, phi_, alpha_):
            per_row = xm.combine_stats(zl_, lin_, lex_, phi_, alpha_, lbl_in,
                                       extra=extra, fusion=fusion)
            return jnp.sum(per_row * v) * (g / den)

        gz, gin, gex, gphi, galpha = jax.grad(
            combined, argnums=(0, 1, 2, 3, 4))(zl, lse_in, lse_ex, phi,
                                               alpha)

        sr3 = jnp.swapaxes(sr, 0, 1)
        ploc = table_local.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = (shard * ploc).astype(jnp.int32)
        n_valid = jnp.clip(num_items - offset, 0, ploc)
        lbl_local, _ = xent._localize_labels(labels, ploc, num_items,
                                             MODEL_AXIS)
        sr3p, tabp, lblp, iidp = xm._pad_operands(
            sr3, table_local, lbl_local, iids.astype(jnp.int32))
        Bp = sr3p.shape[1]
        pad = ((0, 0), (0, Bp - B))
        dsr, dtab = xm._bwd_pallas(
            jnp.pad(gz, pad), jnp.pad(gin, pad), jnp.pad(gex, pad),
            sr3p, tabp, lblp, iidp, jnp.pad(lse_in, pad),
            jnp.pad(lse_ex, pad), n_valid, offset, scale=scale,
            normalize_table=normalize_table, n_sess=n_sess)
        dsr = jax.lax.psum(dsr, MODEL_AXIS)[:, :B, :sr.shape[2]]
        dtab = _reduce_table_grad(dtab[:ploc, :table_local.shape[1]],
                                  scatter)
        galpha = jax.lax.psum(galpha, DATA_AXIS)
        return (jnp.swapaxes(dsr, 0, 1).astype(sr.dtype),
                dtab.astype(table_local.dtype), gphi, galpha)

    dsr, dtab, gphi, galpha = shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(MODEL_AXIS, None),
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS, None),
                  P(DATA_AXIS, None, None), P(), P(None, DATA_AXIS),
                  P(None, DATA_AXIS), P(None, DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS, None, None), tab_spec,
                   P(DATA_AXIS, None, None), P()),
        check_vma=False,
    )(sr, table, labels, valid, iids, phi, alpha, zl, lse_in, lse_ex, den)
    return dsr, dtab, None, None, None, gphi, galpha


_fused_multi_mesh.defvjp(_fused_multi_mesh_fwd, _fused_multi_mesh_bwd)


def fused_multi_loss_sharded(mesh, sr, table, labels, valid, iids, phi,
                             alpha, *, scale: float, num_items: int,
                             normalize_table: bool, extra: bool,
                             fusion: bool):
    """Mesh version of ``ops.xent_multi.multi_nll_loss``: the catalog is
    row-sharded over ``model``, the batch over ``data``; each shard
    streams only its table rows through the multi-order REnorm kernel and
    the per-partition (max, sum-exp, label-logit) stats merge with [K, B]
    collectives.  phi/alpha gradients come from re-differentiating the
    tiny stats combiner in the backward shard_map."""
    if phi is None:
        phi = jnp.zeros(sr.shape[:2] + (2,), jnp.float32)
    return _fused_multi_mesh(mesh, float(scale), int(num_items),
                             bool(normalize_table), bool(extra),
                             bool(fusion), sr, table,
                             labels.astype(jnp.int32), valid,
                             iids.astype(jnp.int32), phi, alpha)


def opt_state_sharding(mesh, opt_state_shapes):
    """Shardings for the optimizer state: embedding-table moments shard
    over BOTH mesh axes (rows split model-major, data-minor — matching
    the reduce-scattered gradient layout of ``_table_grad_layout``), so
    Adam's mu/nu for the one big tensor cost ``P*D/(mp*dp)`` per device
    instead of ``P*D/mp``.  Everything else follows the param rule
    (replicated; 2-D leaves named 'embedding' row-sharded over model)."""
    dp = mesh.shape[DATA_AXIS]
    mp = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        keys = [getattr(e, "key", getattr(e, "name", None)) for e in path]
        if "embedding" in keys and getattr(leaf, "ndim", 0) == 2:
            if (leaf.shape[0] // mp) % dp == 0 and dp > 1:
                return NamedSharding(mesh, P((MODEL_AXIS, DATA_AXIS), None))
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, opt_state_shapes)


def init_opt_state(mesh, tx, params):
    """tx.init with ZeRO placement for the table moments."""
    shapes = jax.eval_shape(tx.init, params)
    sh = opt_state_sharding(mesh, shapes)
    return jax.jit(tx.init, out_shardings=sh)(params)


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
    opt_state = init_opt_state(mesh, tx, params)
    return params, state, opt_state


def abstract_step_operands(mesh, model, tx, batch):
    """(params, state, opt_state, batch, rng) as ShapeDtypeStructs with
    their canonical shardings — for AOT-lowering a train step against a
    mesh whose devices may not exist (e.g. a
    ``jax.experimental.topologies`` v5e descriptor: real TPU HLO with
    the backend's actual collective dtypes, no hardware needed).
    ``batch`` may hold numpy leaves."""
    import jax.numpy as _jnp
    from sessionrec_tpu.parallel.mesh import (batch_sharding,
                                              param_sharding, replicated)

    params, state = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    opt_state = jax.eval_shape(tx.init, params)

    def abstract(tree, shardings):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            tree, shardings)

    params = abstract(params, param_sharding(mesh, params))
    state = abstract(state, replicated(mesh, state))
    opt_state = abstract(opt_state, opt_state_sharding(mesh, opt_state))
    batch = jax.tree.map(_jnp.asarray, batch)
    batch = abstract(batch, batch_sharding(mesh, batch))
    key = jax.eval_shape(lambda: jax.random.PRNGKey(1))
    key = jax.ShapeDtypeStruct(key.shape, key.dtype,
                               sharding=NamedSharding(mesh, P()))
    return params, state, opt_state, batch, key


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


def sharded_count_ranks(mesh, scores, labels, k: int):
    """Distributed label ranks by counting (catalog-sharded scores).

    The mesh form of ``scoring.label_ranks_by_count``: each model shard
    counts ``#{j local : s_j > s_label}`` plus the stable-tie term
    against GLOBAL column ids, and three tiny ``psum``s over ``model``
    replace ``sharded_topk``'s two ``[B, k * n_shards]`` all-gathers +
    local sorts — the label's own score is plucked from the shard that
    owns its column (psum of one bitwise-exact contribution + zeros),
    so ties resolve identically to a global ``lax.top_k``
    (tests/test_runner_sharded.py).
    """
    def local(sc, lab):
        shard = jax.lax.axis_index(MODEL_AXIS)
        p_local = sc.shape[-1]
        lab = lab.astype(jnp.int32)
        local_lab = lab - shard * p_local
        present = (local_lab >= 0) & (local_lab < p_local)
        got = jnp.take_along_axis(
            sc, jnp.clip(local_lab, 0, p_local - 1)[:, None], axis=1)[:, 0]
        lv = jax.lax.psum(jnp.where(present, got, 0.0), MODEL_AXIS)
        gcol = shard * p_local + jnp.arange(p_local)
        gt = jax.lax.psum(
            jnp.sum((sc > lv[:, None]).astype(jnp.int32), axis=1),
            MODEL_AXIS)
        eq = jax.lax.psum(
            jnp.sum(((sc == lv[:, None]) & (gcol[None, :] < lab[:, None]))
                    .astype(jnp.int32), axis=1), MODEL_AXIS)
        rank = gt + eq + 1
        return jnp.where(rank <= k, rank, 0)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, MODEL_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(scores, labels)


def shard_concat_rows(mesh, pieces):
    """Concatenate arrays along axis 0 PER DATA SHARD (zero wire).

    A plain ``jnp.concatenate`` of two data-sharded blocks is a global
    resharding: shard i of the result owns a row range spanning both
    blocks, so GSPMD inserts shuffles — and, measured on the split-batch
    mesh step, gave up and REPLICATED the whole upstream graph-side
    (54 MB of lookup all-gathers per step at dp=8).  Each shard instead
    concatenates its own local rows; the resulting global row order is
    shard-interleaved, which every consumer here is invariant to (masked
    mean losses, per-row ranks, metric sums).  All pieces must be
    data-sharded on axis 0 with per-shard row counts intact (the split
    loader rounds its caps accordingly)."""
    def local(*xs):
        return jnp.concatenate(xs, axis=0)

    nd = pieces[0].ndim
    spec = P(DATA_AXIS, *([None] * (nd - 1)))
    return shard_map(local, mesh=mesh, in_specs=(spec,) * len(pieces),
                     out_specs=spec, check_vma=False)(*pieces)


def split_head_sharded(model, mesh, params, state, batch, *, training,
                       rng):
    """(sr, table, labels, valid, new_state) for a (possibly nested)
    SplitBatch on the mesh: the graph-side runs once per length tier
    and the session vectors join with ``shard_concat_rows`` instead of
    the model's global concat (see there).  Valid for BN-free models at
    training time and for EVERY model at eval time (eval BN uses
    running stats, so blocks are independent)."""
    from sessionrec_tpu.models.layers import split_parts_rngs
    from sessionrec_tpu.parallel.mesh import with_mesh
    model = with_mesh(model, mesh)
    parts, keys = split_parts_rngs(batch, rng)
    srs = []
    table = new_state = None
    for part, key in zip(parts, keys):
        sr_p, table, new_state = model.head(params, state, part,
                                            training=training, rng=key)
        srs.append(sr_p)
    sr = shard_concat_rows(mesh, srs)
    labels = shard_concat_rows(
        mesh, [p.labels.astype(jnp.int32) for p in parts])
    valid = shard_concat_rows(mesh, [p.valid for p in parts])
    return sr, table, labels, valid, new_state


def split_head_multi_sharded(model, mesh, params, state, batch, *,
                             training, rng):
    """Mesh (possibly nested) SplitBatch form of ``model.head_multi``
    (see split_head_sharded): returns (sr, table, phi, alpha, iids,
    labels, valid, new_state) with per-shard row joins; tiers'
    narrower id rows pad with -1 to the widest tier."""
    from sessionrec_tpu.models.layers import split_parts_rngs
    from sessionrec_tpu.parallel.mesh import with_mesh
    model = with_mesh(model, mesh)
    parts, keys = split_parts_rngs(batch, rng)
    srs, phis, iids_p = [], [], []
    table = alpha = new_state = None
    for part, key in zip(parts, keys):
        sr_p, table, phi_p, alpha, iid_p, new_state = model.head_multi(
            params, state, part, training=training, rng=key)
        srs.append(sr_p)
        phis.append(phi_p)
        iids_p.append(iid_p)
    sr = shard_concat_rows(mesh, srs)
    w = max(x.shape[1] for x in iids_p)
    iids = shard_concat_rows(mesh, [
        jnp.pad(x, ((0, 0), (0, w - x.shape[1])), constant_values=-1)
        for x in iids_p])
    phi = None if phis[0] is None else shard_concat_rows(mesh, phis)
    labels = shard_concat_rows(
        mesh, [p.labels.astype(jnp.int32) for p in parts])
    valid = shard_concat_rows(mesh, [p.valid for p in parts])
    return sr, table, phi, alpha, iids, labels, valid, new_state


def sharded_head_count_ranks(mesh, sr, table, labels, k, *, num_items,
                             normalize_table=False, compute_dtype=None):
    """Plain-head mesh eval ranks straight from (sr, raw table).

    Each catalog shard streams its own table rows through the slab
    counting ranker (ops/streamed_eval.py:streamed_count_ranks with a
    column offset) and the label logit + two counters merge with three
    tiny [B] ``psum``s.  Compared to ranking ``model.apply``'s
    materialised log-probs, this skips the full-catalog log-softmax
    entirely — its cross-shard max/sum collectives AND the two extra
    [B, P/mp] HBM passes per shard (positive scaling and log_softmax
    are rank-preserving; same argument as runner._eval_ranks).
    """
    from sessionrec_tpu.ops.streamed_eval import streamed_count_ranks

    def local(sr, tab, labels):
        ploc = tab.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = (shard * ploc).astype(jnp.int32)
        n_valid = jnp.clip(num_items - offset, 0, ploc)
        return streamed_count_ranks(
            sr, tab, labels, num_items=num_items, k=k,
            normalize_table=normalize_table, compute_dtype=compute_dtype,
            col_offset=offset, n_valid=n_valid, axis_name=MODEL_AXIS)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(MODEL_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(sr, table, labels)


def sharded_multi_count_ranks(mesh, sr, table, labels, iids, phi, alpha, *,
                              num_items, extra, fusion, k, scale=12.0,
                              normalize_table=True, compute_dtype=None):
    """MSGIFSR REnorm/fusion mesh eval ranks from ``head_multi`` outputs —
    neither the ``[B, K, P]`` score tensors nor the ``[B, P]`` session
    mask ever materialise on the mesh (they did via ``model.apply``
    until round 5).  Per shard: the streamed two-pass counting ranker
    over local table rows; the (max, sum-exp) softmax stats merge across
    shards exactly like the fused training loss's
    (_merge_partial_lse-style pmax + rescaled psum inside
    ops/streamed_eval._multi_ctx), then label score and counters merge
    with [B] psums.  Reference score: msgifsr.py:283-317."""
    from sessionrec_tpu.ops.streamed_eval import streamed_multi_count_ranks
    if phi is None:
        phi = jnp.zeros(sr.shape[:2] + (2,), jnp.float32)

    def local(sr, tab, labels, iids, phi, alpha):
        ploc = tab.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = (shard * ploc).astype(jnp.int32)
        n_valid = jnp.clip(num_items - offset, 0, ploc)
        return streamed_multi_count_ranks(
            sr, tab, labels, iids, phi, alpha, num_items=num_items,
            extra=extra, fusion=fusion, k=k, scale=scale,
            normalize_table=normalize_table, compute_dtype=compute_dtype,
            col_offset=offset, n_valid=n_valid, axis_name=MODEL_AXIS)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(MODEL_AXIS, None),
                  P(DATA_AXIS), P(DATA_AXIS, None),
                  P(DATA_AXIS, None, None), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(sr, table, labels.astype(jnp.int32), iids.astype(jnp.int32), phi,
      alpha)


def _sharded_eval_ranks(model, mesh, params, state, batch, cutoff,
                        rank_method=None):
    """(label ranks, matching valid mask) of one batch on the mesh.

    Counting (the default) ranks from the head outputs without
    materialising catalog-sized score tensors or paying the
    log-softmax collectives; ``rank_method="topk"`` keeps the
    apply + candidate-merge path as the A/B reference.  For a
    SplitBatch the blocks' rows join per data shard
    (shard_concat_rows) — eval-mode BN uses running stats, so
    per-block heads are exact for every model — and the returned
    ``valid`` is in the SAME shard-interleaved row order as the ranks
    (the caller must not pair ranks with ``batch.valid``)."""
    from sessionrec_tpu.graph.batch import SplitBatch
    is_split = isinstance(batch, SplitBatch)
    if not scoring.use_count_ranks(rank_method):
        log_probs, _ = model.apply(params, state, batch, training=False,
                                   rng=None)
        log_probs = jax.lax.with_sharding_constraint(
            log_probs, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)))
        _, idx = sharded_topk(mesh, log_probs, cutoff)
        hit = idx == batch.labels[:, None]
        rank = jnp.argmax(hit, axis=-1) + 1
        return jnp.where(jnp.any(hit, axis=-1), rank, 0), batch.valid
    if getattr(model, "has_plain_head", False):
        if is_split:
            sr, table, labels, valid, _ = split_head_sharded(
                model, mesh, params, state, batch, training=False,
                rng=None)
        else:
            sr, table, _ = model.head(params, state, batch, training=False,
                                      rng=None)
            labels, valid = batch.labels, batch.valid
        return sharded_head_count_ranks(
            mesh, sr, table, labels, cutoff,
            num_items=model.num_items,
            normalize_table=getattr(model, "table_norm", False),
            compute_dtype=model.cdt), valid
    if getattr(model, "has_multi_head", False):
        if is_split:
            sr, table, phi, alpha, iids, labels, valid, _ = \
                split_head_multi_sharded(model, mesh, params, state, batch,
                                         training=False, rng=None)
        else:
            sr, table, phi, alpha, iids, _ = model.head_multi(
                params, state, batch, training=False, rng=None)
            labels, valid = batch.labels, batch.valid
        return sharded_multi_count_ranks(
            mesh, sr, table, labels, iids, phi, alpha,
            num_items=model.num_items, extra=model.extra,
            fusion=model.fusion, k=cutoff, scale=float(model.scale),
            normalize_table=getattr(model, "table_norm", False),
            compute_dtype=model.cdt), valid
    log_probs, _ = model.apply(params, state, batch, training=False,
                               rng=None)
    log_probs = jax.lax.with_sharding_constraint(
        log_probs, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)))
    return sharded_count_ranks(mesh, log_probs, batch.labels,
                               cutoff), batch.valid


def make_sharded_unrolled_eval_step(model, mesh, cutoff=20, project=True,
                                    rank_method=None):
    """Mesh counterpart of runner.make_unrolled_eval_step: scan over a
    stacked chunk of eval batches, per-batch distributed ranks over the
    catalog shards (head-based counting by default — see
    ``_sharded_eval_ranks``), summed (hit, mrr, n)."""
    from sessionrec_tpu.parallel.mesh import with_mesh
    model = with_mesh(model, mesh)

    def eval_chunk(params, state, batches):
        if project:
            params = model.project_params(params)

        def one(carry, batch):
            ranks, v = _sharded_eval_ranks(model, mesh, params, state,
                                           batch, cutoff, rank_method)
            hit = jnp.sum((ranks > 0) * v)
            mrr = jnp.sum(jnp.where(ranks > 0,
                                    1.0 / jnp.maximum(ranks, 1), 0.0) * v)
            h, m, c = carry
            return (h + hit, m + mrr, c + jnp.sum(v)), None

        zero = jnp.float32(0.0)
        (h, m, n), _ = jax.lax.scan(one, (zero, zero, zero), batches)
        return h, m, n

    return jax.jit(eval_chunk)


def make_sharded_eval_step(model, mesh, cutoff=20, rank_method=None):
    """Eval step ranking over the catalog shards (head-based counting by
    default, apply + candidate-merge top-k via ``rank_method="topk"``)."""
    from sessionrec_tpu.parallel.mesh import with_mesh
    model = with_mesh(model, mesh)

    def eval_step(params, state, batch):
        params = model.project_params(params)
        ranks, v = _sharded_eval_ranks(model, mesh, params, state, batch,
                                       cutoff, rank_method)
        hit = jnp.sum((ranks > 0) * v)
        mrr = jnp.sum(jnp.where(ranks > 0,
                                1.0 / jnp.maximum(ranks, 1), 0.0) * v)
        return hit, mrr, jnp.sum(v)

    return jax.jit(eval_step)
