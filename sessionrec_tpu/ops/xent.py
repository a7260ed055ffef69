"""Fused full-catalog softmax cross-entropy (Pallas TPU kernel).

Every model's training loss is ``nll(log_softmax(scale * sr @ table^T))``
over the whole item catalog (reference: srgnn.py:145-147, niser.py:152-156,
lessr.py:182-183, msgifsr.py:306-309 + train.py:99).  Done naively, XLA
materialises the ``[B, P]`` logits in HBM three times per step (forward
logits, log-softmax, and the recompute mirror in backward) — at yoochoose
scale that is ~76 MB per pass, and the op is HBM-bound, not MXU-bound.

This module implements the flash-softmax treatment of that loss:

* **forward** streams the catalog in ``[TILE_P, D]`` tiles through one
  Pallas kernel, keeping a running row max / sum-exp / label-logit in VMEM
  — the ``[B, P]`` logits never exist in HBM; outputs are the per-row loss
  and the log-partition (the only residual backward needs).
* **backward** re-streams the same tiles, forms the softmax tile on the
  fly, and accumulates ``d_sr`` in VMEM while writing ``d_table`` tile by
  tile — again no ``[B, P]`` intermediate.

FLOPs triple-matmul cost is unchanged (that is the speed-of-light part,
it runs on the MXU); what disappears is every HBM round-trip of the
logits.  Numerics: logits always accumulate in float32
(``preferred_element_type``) even when ``sr``/``table`` are bfloat16, and
the softmax/log-sum-exp runs in float32.

On non-TPU backends ``fused_nll_loss`` falls back to an equivalent pure
jnp implementation (same math; used as the parity oracle in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sessionrec_tpu.ops.masked import NEG_INF

# Catalog tile streamed per grid step.  scoring.pad_catalog allocates
# the table at a multiple of TILE_P so the kernel consumes it directly
# (a smaller 128-multiple allocation cost a full-table pad copy before
# the kernel and a slice+add after its gradient, ~220us/step measured);
# the wrapper still re-pads defensively for tables of other sizes.
TILE_P = 512
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

_NORM_EPS = 1e-12   # torch F.normalize eps (layers.l2norm)


def _row_norms(tab):
    """Per-row L2 norm of a [TP, D] tile, f32, shape [TP, 1]."""
    t = tab.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True))


def _fwd_kernel(scale, normalize_table, nv_ref, sr_ref, tab_ref, lbl_ref,
                m_ref, s_ref, zl_ref):
    """One catalog tile of the online softmax reduction.

    ``nv_ref`` (SMEM scalar) is the number of *valid* leading table rows —
    ``num_items`` single-chip, or this shard's live row count when the
    table is row-sharded (then ``lbl`` arrives pre-shifted into local
    coordinates, so out-of-shard labels never match).  Outputs are the
    running (row max, sum-exp relative to it, label logit) — enough to
    finish the loss locally or to psum-combine across catalog shards.
    """
    j = pl.program_id(0)
    n_valid = nv_ref[0]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        zl_ref[:] = jnp.zeros_like(zl_ref)

    # [B, TILE_P] logits tile, f32 accumulation on the MXU
    z = scale * jax.lax.dot_general(
        sr_ref[:], tab_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if normalize_table:
        # fold l2norm(table) into the logits: divide each column by the
        # row norm of its table row — no separate [P, D] pass over HBM
        n = _row_norms(tab_ref[:])                       # [TP, 1]
        z = z / jnp.maximum(n, _NORM_EPS)[:, 0][None, :]
    col = j * TILE_P + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z = jnp.where(col < n_valid, z, NEG_INF)

    # label logit extraction (valid labels always < n_valid)
    lbl = lbl_ref[:]                                     # [B, 1] int32
    zl_ref[:] += jnp.sum(jnp.where(col == lbl, z, 0.0), axis=1, keepdims=True)

    # online log-sum-exp
    m_tile = jnp.max(z, axis=1, keepdims=True)
    m_new = jnp.maximum(m_ref[:], m_tile)
    # guard: exp(NEG_INF - NEG_INF) on the first all-masked tile
    m_safe = jnp.maximum(m_new, NEG_INF * 0.5)
    s_ref[:] = s_ref[:] * jnp.exp(m_ref[:] - m_safe) + \
        jnp.sum(jnp.exp(z - m_safe), axis=1, keepdims=True)
    m_ref[:] = m_new


def _fwd_pallas(sr, table, labels, n_valid, *, scale, normalize_table):
    """Partial softmax stats over ``table``'s (locally valid) rows.

    Returns ``(m, s, zl)`` per row: running max (relative to which ``s``
    is the sum of exponentials) and the label logit (0 when the label is
    outside [0, n_valid)).  ``lse = safe(m) + log(s)``.
    """
    B, D = sr.shape
    P = table.shape[0]
    grid = P // TILE_P
    kernel = functools.partial(_fwd_kernel, scale, normalize_table)
    out_shape = [jax.ShapeDtypeStruct((B, 1), jnp.float32)] * 3
    m, s, zl = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ] * 3,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * P,
            bytes_accessed=P * D * sr.dtype.itemsize + B * D * 4,
            transcendentals=B * P),
        interpret=_interpret(),
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), sr, table,
      labels[:, None].astype(jnp.int32))
    return m[:, 0], s[:, 0], zl[:, 0]


def _finish_lse(m, s):
    """log-sum-exp from the kernel's (running max, relative sum-exp)."""
    return jnp.maximum(m, NEG_INF * 0.5) + \
        jnp.log(jnp.maximum(s, jnp.finfo(jnp.float32).tiny))


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(scale, mxu_dtype, normalize_table, nv_ref, g_ref, sr_ref,
                tab_ref, lbl_ref, lse_ref, dsr_ref, dtab_ref):
    j = pl.program_id(0)
    n_valid = nv_ref[0]

    if normalize_table:
        n = jnp.maximum(_row_norms(tab_ref[:]), _NORM_EPS)    # [TP, 1]
        that = (tab_ref[:].astype(jnp.float32) / n)           # normalized tile
        tmm = that.astype(mxu_dtype)
    else:
        tmm = tab_ref[:].astype(mxu_dtype)

    z = scale * jax.lax.dot_general(
        sr_ref[:], tmm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    col = j * TILE_P + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    p = jnp.where(col < n_valid, jnp.exp(z - lse_ref[:]), 0.0)
    onehot = (col == lbl_ref[:]).astype(jnp.float32)
    dz = ((p - onehot) * (scale * g_ref[:])).astype(mxu_dtype)   # [B, TP]

    # grad wrt the (normalized) table tile: dz^T @ sr -> [TP, D]
    gtab = jax.lax.dot_general(
        dz, sr_ref[:].astype(mxu_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if normalize_table:
        # VJP of t_hat = t / max(||t||, eps):
        #   dt = (G - (G . t_hat) t_hat * [n > eps]) / max(n, eps)
        gdot = jnp.sum(gtab * that, axis=1, keepdims=True)
        live = (n > _NORM_EPS).astype(jnp.float32)
        gtab = (gtab - gdot * that * live) / n
    dtab_ref[:] = gtab.astype(dtab_ref.dtype)

    # d_sr accumulates across tiles: dz @ t_hat -> [B, D]
    contrib = jax.lax.dot_general(
        dz, tmm,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dsr_ref[:] = jnp.zeros_like(dsr_ref)

    dsr_ref[:] += contrib


def _bwd_pallas(g, sr, table, labels, lse, n_valid, *, scale,
                normalize_table):
    B, D = sr.shape
    P = table.shape[0]
    grid = P // TILE_P
    # bf16 inputs -> run the two backward matmuls at bf16 MXU rate
    # (f32 accumulation); f32 inputs stay f32.
    mxu_dtype = sr.dtype if sr.dtype == jnp.bfloat16 else jnp.float32
    kernel = functools.partial(_bwd_kernel, scale, mxu_dtype,
                               normalize_table)
    dsr, dtab = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, D), jnp.float32),
                   jax.ShapeDtypeStruct((P, D), table.dtype)],
        scratch_shapes=[],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * B * D * P,
            bytes_accessed=2 * P * D * sr.dtype.itemsize + B * D * 4,
            transcendentals=B * P),
        interpret=_interpret(),
    )(jnp.asarray(n_valid, jnp.int32).reshape(1),
      g[:, None].astype(jnp.float32), sr, table,
      labels[:, None].astype(jnp.int32), lse[:, None])
    return dsr, dtab


# ---------------------------------------------------------------------------
# custom-vjp op + public wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _catalog_xent(sr, table, labels, scale, num_items, normalize_table):
    m, s, zl = _fwd_pallas(sr, table, labels, num_items, scale=scale,
                           normalize_table=normalize_table)
    return _finish_lse(m, s) - zl


def _catalog_xent_fwd(sr, table, labels, scale, num_items, normalize_table):
    m, s, zl = _fwd_pallas(sr, table, labels, num_items, scale=scale,
                           normalize_table=normalize_table)
    lse = _finish_lse(m, s)
    return lse - zl, (sr, table, labels, lse)


def _catalog_xent_bwd(scale, num_items, normalize_table, res, g):
    sr, table, labels, lse = res
    dsr, dtab = _bwd_pallas(g, sr, table, labels, lse, num_items,
                            scale=scale, normalize_table=normalize_table)
    return dsr.astype(sr.dtype), dtab, None


_catalog_xent.defvjp(_catalog_xent_fwd, _catalog_xent_bwd)


# ---------------------------------------------------------------------------
# catalog-sharded variant (tensor parallel over the 'model' mesh axis)
#
# These are *explicit* forward/backward halves meant to be called inside
# separate shard_map bodies (parallel/sharded.py stitches them together
# with a mesh-level jax.custom_vjp).  They are deliberately NOT a nested
# custom_vjp: with ``check_vma=False`` shard_map's transpose seeds
# replicated cotangents with an axis-size-dependent convention, which
# silently mis-scales gradients of row-sharded inputs (d_table came out
# 1/mp of the truth).  Explicit bwd psums sidestep the convention.
# ---------------------------------------------------------------------------


def _localize_labels(labels, ploc, num_items, axis_name):
    """Shift global labels into this catalog shard's row coordinates.

    Off-shard labels are sent to -1 so they can never match a column.
    (Merely being outside [0, n_valid) is NOT enough: the kernel's tile
    is padded to TILE_P, so an off-shard label < Pp would match a masked
    NEG_INF column and poison the label-logit / backward one-hot.)
    Returns ``(lbl_local, n_valid)``.
    """
    shard = jax.lax.axis_index(axis_name)
    offset = (shard * ploc).astype(jnp.int32)
    # live rows on this shard: catalog rows >= num_items are padding
    n_valid = jnp.clip(num_items - offset, 0, ploc)
    lbl_local = labels.astype(jnp.int32) - offset
    lbl_local = jnp.where((lbl_local >= 0) & (lbl_local < n_valid),
                          lbl_local, -1)
    return lbl_local, n_valid


def sharded_xent_fwd(sr, table_local, labels, *, scale: float,
                     num_items: int, normalize_table: bool = False,
                     axis_name: str = "model"):
    """Per-row catalog cross-entropy with the table row-sharded over
    ``axis_name`` — call **inside shard_map**; forward values only.

    ``sr [B, D]`` and ``labels [B]`` are per-data-shard (replicated over
    ``axis_name``); ``table_local [P/mp, D]`` is this shard's rows.  Each
    shard streams only its rows through the flash-softmax kernel; the
    partial (max, sum-exp, label-logit) stats are combined with one pmax
    + two psums of ``[B]`` vectors.  The ``[B, P]`` logits never exist —
    globally or per shard.  Returns ``(per_row_loss [B], lse [B])``;
    ``lse`` is the residual ``sharded_xent_bwd`` needs.
    """
    B, D = sr.shape
    ploc = table_local.shape[0]
    lbl_local, n_valid = _localize_labels(labels, ploc, num_items, axis_name)

    Bp, Dp = _round_up(B, 8), _round_up(D, _LANE)
    Pp = _round_up(ploc, TILE_P)
    srp = jnp.pad(sr, ((0, Bp - B), (0, Dp - D)))
    tabp = jnp.pad(table_local, ((0, Pp - ploc), (0, Dp - D)))
    lblp = jnp.pad(lbl_local, (0, Bp - B), constant_values=-1)

    m, s, zl = _fwd_pallas(srp, tabp, lblp, n_valid, scale=scale,
                           normalize_table=normalize_table)
    # combine per-shard partial stats: two tiny [B] collectives over ICI
    m_g = jax.lax.pmax(m, axis_name)
    m_safe = jnp.maximum(m_g, NEG_INF * 0.5)
    s_g = jax.lax.psum(s * jnp.exp(jnp.maximum(m, NEG_INF) - m_safe),
                       axis_name)
    zl_g = jax.lax.psum(zl, axis_name)
    lse = m_safe + jnp.log(jnp.maximum(s_g, jnp.finfo(jnp.float32).tiny))
    return (lse - zl_g)[:B], lse[:B]


def sharded_xent_bwd(g_row, sr, table_local, labels, lse, *, scale: float,
                     num_items: int, normalize_table: bool = False,
                     axis_name: str = "model"):
    """Backward of ``sharded_xent_fwd`` — call **inside shard_map**.

    ``g_row [B]`` is the cotangent of the per-row loss (already scaled by
    the caller's mean weights), ``lse [B]`` the forward residual.
    Returns ``(d_sr [B, D], d_table_local [P/mp, D])`` where ``d_sr`` is
    psum'd over ``axis_name`` (every catalog shard contributes to it) and
    ``d_table_local`` is this shard's exact row gradient for this data
    shard's rows — the caller psums it over the *data* axis.
    """
    B, D = sr.shape
    ploc = table_local.shape[0]
    lbl_local, n_valid = _localize_labels(labels, ploc, num_items, axis_name)

    Bp, Dp = _round_up(B, 8), _round_up(D, _LANE)
    Pp = _round_up(ploc, TILE_P)
    srp = jnp.pad(sr, ((0, Bp - B), (0, Dp - D)))
    tabp = jnp.pad(table_local, ((0, Pp - ploc), (0, Dp - D)))
    lblp = jnp.pad(lbl_local, (0, Bp - B), constant_values=-1)
    gp = jnp.pad(g_row.astype(jnp.float32), (0, Bp - B))
    lsep = jnp.pad(lse, (0, Bp - B))

    dsr, dtab = _bwd_pallas(gp, srp, tabp, lblp, lsep, n_valid, scale=scale,
                            normalize_table=normalize_table)
    dsr = jax.lax.psum(dsr, axis_name)
    return dsr[:B, :D].astype(sr.dtype), dtab[:ploc, :D]


def catalog_xent(sr, table, labels, *, scale: float, num_items: int,
                 normalize_table: bool = False):
    """Per-row ``-log softmax(scale * sr @ table^T)[label]`` (Pallas).

    ``sr [B, D]``, ``table [P, D]`` (rows >= num_items are padding and are
    excluded from the softmax), ``labels [B]`` int.  Returns ``[B]`` f32.
    Pads B/D/P to hardware-friendly multiples internally.

    ``normalize_table=True`` scores against ``l2norm(table)`` with the
    normalization folded into the kernel (forward AND backward) — the
    separate ``[P, D]`` normalisation pass and its autodiff mirror never
    touch HBM (NISER niser.py:149-151 / MSGIFSR msgifsr.py:276-279
    normalize the catalog every step).
    """
    B, D = sr.shape
    P = table.shape[0]
    Bp, Dp, Pp = _round_up(B, 8), _round_up(D, _LANE), _round_up(P, TILE_P)
    srp = jnp.pad(sr, ((0, Bp - B), (0, Dp - D)))
    tabp = jnp.pad(table, ((0, Pp - P), (0, Dp - D)))
    lblp = jnp.pad(labels, (0, Bp - B))
    loss = _catalog_xent(srp, tabp, lblp, float(scale), int(num_items),
                         bool(normalize_table))
    return loss[:B]


def reference_xent(sr, table, labels, *, scale: float, num_items: int,
                   normalize_table: bool = False):
    """Pure-jnp oracle with identical semantics (used on CPU + in tests)."""
    if normalize_table:
        # sqrt(max(.)) instead of max(norm(.)) so all-zero padding rows
        # get zero (not NaN) gradient — norm() is non-differentiable at 0
        nsq = jnp.sum(jnp.square(table.astype(jnp.float32)), axis=-1,
                      keepdims=True)
        n = jnp.sqrt(jnp.maximum(nsq, _NORM_EPS * _NORM_EPS))
        table = table / n.astype(table.dtype)
    logits = scale * jax.lax.dot_general(
        sr, table, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    imask = jnp.arange(table.shape[0]) < num_items
    logits = jnp.where(imask[None, :], logits, NEG_INF)
    lp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(lp, labels[:, None].astype(jnp.int32),
                                axis=-1)[:, 0]


# Max batch rows per Pallas kernel invocation.  The kernel keeps all B
# rows resident while streaming the catalog, and its per-row stack
# buffers live in scoped vmem (16 MB): measured on v5e at d=256 /
# P=37k, 4256 rows compile and 8416 rows die with a vmem-stack OOM
# (~2 KB/row).  Larger batches chunk over rows OUTSIDE the kernel —
# per-row losses are independent, so chunking is exact, and equal-sized
# chunks keep it to one compiled kernel shape.
MAX_KERNEL_ROWS = 4096


def _row_chunks(n, max_rows):
    """(n_chunks, chunk_size) with equal chunks covering >= n rows."""
    nc = -(-n // max_rows)
    return nc, -(-n // nc)


def fused_nll_loss(sr, table, labels, valid, *, scale: float, num_items: int,
                   normalize_table: bool = False,
                   use_pallas: bool | None = None):
    """Masked-mean catalog cross-entropy (train.py:99 semantics).

    ``use_pallas=None`` auto-selects: the Pallas kernel on TPU, the jnp
    oracle elsewhere (the interpreter would work but is needlessly slow
    inside the CPU test trainer).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = catalog_xent if use_pallas else reference_xent
    B = sr.shape[0]
    if B > MAX_KERNEL_ROWS:
        nc, cs = _row_chunks(B, MAX_KERNEL_ROWS)
        pad = nc * cs - B
        srp = jnp.pad(sr, ((0, pad), (0, 0)))
        lblp = jnp.pad(labels, (0, pad))
        per_row = jnp.concatenate([
            fn(srp[i * cs:(i + 1) * cs], table, lblp[i * cs:(i + 1) * cs],
               scale=scale, num_items=num_items,
               normalize_table=normalize_table)
            for i in range(nc)])[:B]
    else:
        per_row = fn(sr, table, labels, scale=scale, num_items=num_items,
                     normalize_table=normalize_table)
    v = valid.astype(per_row.dtype)
    return jnp.sum(per_row * v) / jnp.maximum(jnp.sum(v), 1.0)
