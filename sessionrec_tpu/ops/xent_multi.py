"""Fused MSGIFSR head loss: multi-order REnorm + IFR fusion (Pallas TPU).

The WSDM'22 headline configuration (``--order 3 --extra --fusion``,
reference msgifsr.py:283-321) scores every order's session vector against
the whole catalog, *splits* the catalog per example into in-session vs
out-of-session items, softmaxes each part separately (REnorm), blends the
two with a learned gate ``phi``, and finally combines the per-order scores
with ``softmax(alpha)`` weights (IFR).  Done naively that is K ``[B, P]``
score tensors plus a ``[B, P]`` membership mask in HBM per step
(~77 MB/order at yoochoose scale).

The flash treatment: the label probability only needs, per (example,
order), three scalars —

* ``lse_in``  — log-sum-exp of ``scale * sr_k . t_hat`` over *in-session*
  columns,
* ``lse_ex``  — same over out-of-session columns,
* ``zl``      — the label's logit,

because ``score_k[label] = phi_k0 * e^{zl - lse_in} * [label in S] +
phi_k1 * e^{zl - lse_ex} * [label not in S]`` (and the non-REnorm variant
uses ``lse = logaddexp(lse_in, lse_ex)``).  One Pallas kernel streams the
catalog in ``[TILE_P, D]`` tiles ONCE for all K orders, maintaining five
running accumulators per (k, row); in-session membership is recomputed
per tile by comparing column ids against the level-1 iid list (<= max_len
ints per example) — the ``[B, P]`` mask never exists.  The tiny ``[B, K]``
stats feed a plain-jnp combiner (phi/alpha/fusion math), so their
gradients come from ordinary autodiff; a custom-vjp backward kernel
re-streams the tiles to turn the stats' cotangents into ``d_sr`` /
``d_table``.

Numerics follow ops/xent.py: f32 logits accumulation on the MXU, f32
log-sum-exp, optional folded table l2norm (forward and backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sessionrec_tpu.ops.masked import NEG_INF
from sessionrec_tpu.ops.xent import (_NORM_EPS, _interpret, _round_up,
                                     _row_norms, TILE_P, _LANE)

# safe-log floor (see models/msgifsr.py:_TINY)
_TINY = 1e-30


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(scale, normalize_table, K, n_sess, meta_ref, sr_ref, tab_ref,
                lbl_ref, iid_ref, min_ref, sin_ref, mex_ref, sex_ref, zl_ref):
    """One catalog tile of the two-partition online softmax, all K orders.

    meta (SMEM int32[2]): (n_valid, col_offset).  ``n_valid`` = live rows
    of this table (shard); ``col_offset`` = global item id of row 0, so
    membership tests run in global id space while labels arrive
    pre-localised (off-shard -> -1).  Outputs are [K, B, 1] running stats.
    """
    j = pl.program_id(0)
    n_valid = meta_ref[0]
    off = meta_ref[1]

    @pl.when(j == 0)
    def _():
        min_ref[:] = jnp.full_like(min_ref, NEG_INF)
        sin_ref[:] = jnp.zeros_like(sin_ref)
        mex_ref[:] = jnp.full_like(mex_ref, NEG_INF)
        sex_ref[:] = jnp.zeros_like(sex_ref)
        zl_ref[:] = jnp.zeros_like(zl_ref)

    B = sr_ref.shape[1]
    col = j * TILE_P + jax.lax.broadcasted_iota(jnp.int32, (B, TILE_P), 1)
    col_g = col + off
    # in-session membership from the level-1 iid list (global ids, -1 pad)
    member = jnp.zeros((B, TILE_P), jnp.bool_)
    for t in range(n_sess):
        member = member | (iid_ref[:, t:t + 1] == col_g)
    live = col < n_valid
    lbl = lbl_ref[:]                                        # [B, 1] local

    if normalize_table:
        inv_n = 1.0 / jnp.maximum(_row_norms(tab_ref[:]), _NORM_EPS)  # [TP,1]

    for k in range(K):
        z = scale * jax.lax.dot_general(
            sr_ref[k], tab_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if normalize_table:
            z = z * inv_n[:, 0][None, :]
        z = jnp.where(live, z, NEG_INF)

        zl_ref[k] += jnp.sum(jnp.where(col == lbl, z, 0.0), axis=1,
                             keepdims=True)

        z_in = jnp.where(member, z, NEG_INF)
        z_ex = jnp.where(member, NEG_INF, z)
        for z_p, m_ref, s_ref in ((z_in, min_ref, sin_ref),
                                  (z_ex, mex_ref, sex_ref)):
            m_tile = jnp.max(z_p, axis=1, keepdims=True)
            m_new = jnp.maximum(m_ref[k], m_tile)
            m_safe = jnp.maximum(m_new, NEG_INF * 0.5)
            s_ref[k] = s_ref[k] * jnp.exp(m_ref[k] - m_safe) + \
                jnp.sum(jnp.exp(z_p - m_safe), axis=1, keepdims=True)
            m_ref[k] = m_new


def _fwd_pallas(sr3, table, labels, iids, n_valid, col_offset, *, scale,
                normalize_table, n_sess):
    """(m_in, s_in, m_ex, s_ex, zl) partial stats, each [K, B] f32.

    ``sr3 [K, B, D]``; ``iids [B, Ns]`` global item ids (-1 = padding);
    ``labels [B]`` local row coordinates (-1 = off-shard/padding).
    """
    K, B, D = sr3.shape
    P = table.shape[0]
    grid = P // TILE_P
    kernel = functools.partial(_fwd_kernel, scale, normalize_table, K,
                               n_sess)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, B, D), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, iids.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((K, B, 1), lambda j: (0, 0, 0),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((K, B, 1), jnp.float32)] * 5,
        cost_estimate=pl.CostEstimate(
            flops=2 * K * B * D * P,
            bytes_accessed=P * D * sr3.dtype.itemsize + K * B * D * 4,
            transcendentals=2 * K * B * P),
        interpret=_interpret(),
    )(jnp.asarray([n_valid, col_offset], jnp.int32), sr3, table,
      labels[:, None].astype(jnp.int32), iids.astype(jnp.int32))
    return tuple(o[..., 0] for o in outs)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(scale, mxu_dtype, normalize_table, K, n_sess, meta_ref,
                sr_ref, tab_ref, lbl_ref, iid_ref, gz_ref, gin_ref, gex_ref,
                lin_ref, lex_ref, dsr_ref, dtab_ref):
    """dz_k = gin_k * p_in + gex_k * p_ex + gzl_k * onehot(label); then
    d_sr_k += scale * dz_k @ t_hat and d_tab = scale * sum_k dz_k^T @ sr_k
    (with the l2norm VJP folded like ops/xent._bwd_kernel)."""
    j = pl.program_id(0)
    n_valid = meta_ref[0]
    off = meta_ref[1]

    B = sr_ref.shape[1]
    col = j * TILE_P + jax.lax.broadcasted_iota(jnp.int32, (B, TILE_P), 1)
    col_g = col + off
    member = jnp.zeros((B, TILE_P), jnp.bool_)
    for t in range(n_sess):
        member = member | (iid_ref[:, t:t + 1] == col_g)
    live = col < n_valid
    lbl = lbl_ref[:]

    if normalize_table:
        n = jnp.maximum(_row_norms(tab_ref[:]), _NORM_EPS)
        that = tab_ref[:].astype(jnp.float32) / n
        tmm = that.astype(mxu_dtype)
    else:
        tmm = tab_ref[:].astype(mxu_dtype)

    @pl.when(j == 0)
    def _():
        dsr_ref[:] = jnp.zeros_like(dsr_ref)

    gthat = jnp.zeros((TILE_P, sr_ref.shape[2]), jnp.float32)
    for k in range(K):
        # tmm is already normalized when normalize_table (unlike the fwd
        # kernel, which divides the raw-table logits by the row norms)
        z = scale * jax.lax.dot_general(
            sr_ref[k], tmm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = jnp.where(live, z, NEG_INF)
        # partition softmaxes relative to the global lse residuals; the
        # where-guards keep empty partitions (lse ~ -inf) finite
        p_in = jnp.where(member & live,
                         jnp.exp(z - jnp.maximum(lin_ref[k], NEG_INF * 0.5)),
                         0.0)
        p_ex = jnp.where((~member) & live,
                         jnp.exp(z - jnp.maximum(lex_ref[k], NEG_INF * 0.5)),
                         0.0)
        onehot = (col == lbl).astype(jnp.float32)
        dz = (gin_ref[k] * p_in + gex_ref[k] * p_ex + gz_ref[k] * onehot) \
            * scale
        dz = dz.astype(mxu_dtype)
        gthat += jax.lax.dot_general(
            dz, sr_ref[k].astype(mxu_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsr_ref[k] += jax.lax.dot_general(
            dz, tmm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if normalize_table:
        gdot = jnp.sum(gthat * that, axis=1, keepdims=True)
        live_row = (n > _NORM_EPS).astype(jnp.float32)
        gthat = (gthat - gdot * that * live_row) / n
    dtab_ref[:] = gthat.astype(dtab_ref.dtype)


def _bwd_pallas(gz, gin, gex, sr3, table, labels, iids, lse_in, lse_ex,
                n_valid, col_offset, *, scale, normalize_table, n_sess):
    K, B, D = sr3.shape
    P = table.shape[0]
    grid = P // TILE_P
    mxu_dtype = sr3.dtype if sr3.dtype == jnp.bfloat16 else jnp.float32
    kernel = functools.partial(_bwd_kernel, scale, mxu_dtype,
                               normalize_table, K, n_sess)
    kb1 = [pl.BlockSpec((K, B, 1), lambda j: (0, 0, 0),
                        memory_space=pltpu.VMEM)] * 5
    dsr, dtab = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, B, D), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, iids.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            *kb1,
        ],
        out_specs=[
            pl.BlockSpec((K, B, D), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((K, B, D), jnp.float32),
                   jax.ShapeDtypeStruct((P, D), table.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * K * B * D * P,
            bytes_accessed=2 * P * D * sr3.dtype.itemsize + K * B * D * 4,
            transcendentals=2 * K * B * P),
        interpret=_interpret(),
    )(jnp.asarray([n_valid, col_offset], jnp.int32), sr3, table,
      labels[:, None].astype(jnp.int32), iids.astype(jnp.int32),
      gz[..., None], gin[..., None], gex[..., None],
      lse_in[..., None], lse_ex[..., None])
    return dsr, dtab


# ---------------------------------------------------------------------------
# stats op (custom vjp) + finishing
# ---------------------------------------------------------------------------

def _finish(m, s):
    return jnp.maximum(m, NEG_INF * 0.5) + \
        jnp.log(jnp.maximum(s, jnp.finfo(jnp.float32).tiny))


def _pad_operands(sr3, table, labels, iids):
    K, B, D = sr3.shape
    P = table.shape[0]
    Bp, Dp = _round_up(B, 8), _round_up(D, _LANE)
    Pp = _round_up(P, TILE_P)
    Np = _round_up(iids.shape[1], _LANE)
    sr3 = jnp.pad(sr3, ((0, 0), (0, Bp - B), (0, Dp - D)))
    table = jnp.pad(table, ((0, Pp - P), (0, Dp - D)))
    labels = jnp.pad(labels, (0, Bp - B), constant_values=-1)
    iids = jnp.pad(iids, ((0, Bp - B), (0, Np - iids.shape[1])),
                   constant_values=-1)
    return sr3, table, labels, iids


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _catalog_multi_stats(sr3, table, labels, iids, scale, num_items,
                         normalize_table, n_sess):
    out, _ = _catalog_multi_stats_fwd(sr3, table, labels, iids, scale,
                                      num_items, normalize_table, n_sess)
    return out


def _catalog_multi_stats_fwd(sr3, table, labels, iids, scale, num_items,
                             normalize_table, n_sess):
    K, B, D = sr3.shape
    sr3p, tabp, lblp, iidp = _pad_operands(sr3, table, labels, iids)
    m_in, s_in, m_ex, s_ex, zl = _fwd_pallas(
        sr3p, tabp, lblp, iidp, num_items, 0, scale=scale,
        normalize_table=normalize_table, n_sess=n_sess)
    lse_in, lse_ex = _finish(m_in, s_in), _finish(m_ex, s_ex)
    out = (zl[:, :B], lse_in[:, :B], lse_ex[:, :B])
    return out, (sr3, table, labels, iids, lse_in, lse_ex)


def _catalog_multi_stats_bwd(scale, num_items, normalize_table, n_sess,
                             res, g):
    sr3, table, labels, iids, lse_in, lse_ex = res
    gz, gin, gex = g
    K, B, D = sr3.shape
    sr3p, tabp, lblp, iidp = _pad_operands(sr3, table, labels, iids)
    Bp = sr3p.shape[1]
    pad = ((0, 0), (0, Bp - B))
    dsr, dtab = _bwd_pallas(
        jnp.pad(gz.astype(jnp.float32), pad),
        jnp.pad(gin.astype(jnp.float32), pad),
        jnp.pad(gex.astype(jnp.float32), pad),
        sr3p, tabp, lblp, iidp, lse_in, lse_ex, num_items, 0,
        scale=scale, normalize_table=normalize_table, n_sess=n_sess)
    return (dsr[:, :B, :D].astype(sr3.dtype), dtab[:table.shape[0], :D],
            None, None)


_catalog_multi_stats.defvjp(_catalog_multi_stats_fwd,
                            _catalog_multi_stats_bwd)


def reference_multi_stats(sr3, table, labels, iids, *, scale, num_items,
                          normalize_table):
    """Pure-jnp oracle: (zl, lse_in, lse_ex) each [K, B] — materialises
    the [K, B, P] logits; used on CPU and as the parity oracle."""
    if normalize_table:
        nsq = jnp.sum(jnp.square(table.astype(jnp.float32)), axis=-1,
                      keepdims=True)
        table = table / jnp.sqrt(jnp.maximum(
            nsq, _NORM_EPS * _NORM_EPS)).astype(table.dtype)
    z = scale * jnp.einsum("kbd,pd->kbp", sr3, table,
                           preferred_element_type=jnp.float32)
    P = table.shape[0]
    live = jnp.arange(P) < num_items
    z = jnp.where(live[None, None, :], z, NEG_INF)
    member = jnp.any(iids[:, :, None] == jnp.arange(P)[None, None, :],
                     axis=1)                                   # [B, P]
    z_in = jnp.where(member[None], z, NEG_INF)
    z_ex = jnp.where(member[None], NEG_INF, z)

    def lse(x):
        m = jnp.max(x, axis=-1)
        m_safe = jnp.maximum(m, NEG_INF * 0.5)
        return m_safe + jnp.log(jnp.maximum(
            jnp.sum(jnp.exp(x - m_safe[..., None]), axis=-1),
            jnp.finfo(jnp.float32).tiny))

    onehot = jnp.arange(P)[None, :] == labels[:, None]         # [B, P]
    zl = jnp.sum(jnp.where(onehot[None], z, 0.0), axis=-1)
    return zl, lse(z_in), lse(z_ex)


# ---------------------------------------------------------------------------
# public loss
# ---------------------------------------------------------------------------

def combine_stats(zl, lse_in, lse_ex, phi, alpha, lbl_in, *, extra, fusion):
    """Per-row label probability -> -log loss, [B] f32.  Stats arrive
    [K, B]; phi [B, K, 2] (REnorm gate) or None; alpha [K].  The exponent
    clamps keep empty-partition stats (lse ~ -inf on padded rows) from
    producing inf * 0 NaNs in the where-branches' gradients."""
    zl, lse_in, lse_ex = zl.T, lse_in.T, lse_ex.T              # [B, K]
    K = zl.shape[1]
    if extra:
        p_in = jnp.exp(jnp.minimum(zl - lse_in, 0.0))
        p_ex = jnp.exp(jnp.minimum(zl - lse_ex, 0.0))
        li = lbl_in.astype(jnp.float32)[:, None]
        p_lbl = phi[..., 0] * p_in * li + phi[..., 1] * p_ex * (1.0 - li)
    else:
        p_lbl = jnp.exp(jnp.minimum(zl - jnp.logaddexp(lse_in, lse_ex), 0.0))
    if K > 1 and fusion:
        w = jax.nn.softmax(alpha.astype(jnp.float32))[None, :]
        score = jnp.sum(p_lbl * w, axis=1)
    else:
        score = p_lbl[:, 0]                                    # msgifsr.py:317
    return -jnp.log(jnp.maximum(score, _TINY))


def multi_nll_loss(sr, table, labels, valid, iids, phi, alpha, *,
                   scale: float, num_items: int, normalize_table: bool,
                   extra: bool, fusion: bool, use_pallas: bool | None = None):
    """Masked-mean MSGIFSR loss with REnorm/fusion, fused (train.py:99 +
    msgifsr.py:283-321 semantics).

    ``sr [B, K, D]``, ``table [P, D]`` (rows >= num_items are padding),
    ``labels [B]``, ``valid [B]``, ``iids [B, N]`` level-1 session item
    ids with -1 padding, ``phi [B, K, 2]`` (None unless ``extra``),
    ``alpha [K]``.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    sr3 = jnp.swapaxes(sr, 0, 1)                               # [K, B, D]
    labels = labels.astype(jnp.int32)
    iids = iids.astype(jnp.int32)
    K, B = sr3.shape[0], sr3.shape[1]
    from sessionrec_tpu.ops.xent import MAX_KERNEL_ROWS, _row_chunks
    if use_pallas:
        def stats(sr3, labels, iids):
            return _catalog_multi_stats(
                sr3, table, labels, iids, float(scale), int(num_items),
                bool(normalize_table), int(iids.shape[1]))
    else:
        def stats(sr3, labels, iids):
            return reference_multi_stats(
                sr3, table, labels, iids, scale=scale, num_items=num_items,
                normalize_table=normalize_table)
    if K * B > MAX_KERNEL_ROWS:
        # the multi kernel's vmem-stack rows scale with K*B (see
        # xent.MAX_KERNEL_ROWS), but its backward also carries [K*B, d]
        # f32 accumulators on the stack — measured: K=3 chunks of 1072
        # rows still overshoot the 16M scoped vmem by 1.2M, 768 fits
        nc, cs = _row_chunks(B, max(min(MAX_KERNEL_ROWS // K, 768), 256))
        pad = nc * cs - B
        sr3p = jnp.pad(sr3, ((0, 0), (0, pad), (0, 0)))
        lblp = jnp.pad(labels, (0, pad))
        iidp = jnp.pad(iids, ((0, pad), (0, 0)), constant_values=-1)
        outs = [stats(sr3p[:, i * cs:(i + 1) * cs],
                      lblp[i * cs:(i + 1) * cs],
                      iidp[i * cs:(i + 1) * cs]) for i in range(nc)]
        zl, lse_in, lse_ex = (jnp.concatenate(x, axis=1)[:, :B]
                              for x in zip(*outs))
    else:
        zl, lse_in, lse_ex = stats(sr3, labels, iids)
    lbl_in = jnp.any(iids == labels[:, None], axis=1)
    per_row = combine_stats(zl, lse_in, lse_ex, phi, alpha, lbl_in,
                            extra=extra, fusion=fusion)
    v = valid.astype(per_row.dtype)
    return jnp.sum(per_row * v) / jnp.maximum(jnp.sum(v), 1.0)
