"""Fused MSHGNN intra-level GAT pair: one Pallas kernel for both
direction convs + residual + bias + head-max.

Reference semantics (src/models/msgifsr.py:58-89 + the vendored DGL
GATConv, gatconv.py:254-319): per level, MSHGNN runs an 8-head additive-
attention conv over the intra adjacency (conv1) and over the reversed
graph (conv2), sums the per-destination results, and takes the max over
heads.  The dense JAX path (models/layers.py:gat_apply) materialises a
``[B, N, H, F]`` tensor per conv (~21 MB at the bench config) plus a
soup of ``[B, N, N, H]`` attention intermediates whose XLA layouts force
~0.5 ms/step of pure copies (measured; see BENCH_NOTES.md).

This kernel instead processes ``Bb`` sessions per grid step, flattened
to ``R = Bb*N`` rows, with the batch adjacency **block-diagonalised** to
``[R, R]`` outside the kernel: every step of the attention chain is then
a dense, full-width tile op —

    fs_h  = hd @ W_h^T                   [R, F]     (one MXU matmul)
    zT_h  = leaky(er_h ⊕ el_h)           [R, R]     (outer broadcast,
                                                     [dst, src] layout)
    aT_h  = masked softmax over lanes    [R, R]     (mask = blockdiag adj,
                                                     so cross-session
                                                     pairs get 0 weight)
    rst_h = aT_h @ fs_h                  [R, F]     (dense MXU matmul)

Grid layout is ``(batch blocks, heads)`` — one head of both convs per
grid step.  This keeps the compiled kernel body ~8x smaller than a
fully head-unrolled version (whose Mosaic compile took minutes) and
lets the per-head weight/attention parameters stream in as ``(F, D)`` /
``(1, F)`` blocks.  The per-head pre-max activations ``acc`` are
exported as a forward output and consumed by the backward as the
head-max residual, so the backward runs a single pass.

Mosaic performance rules baked in (learned by measuring — a first
version using ``A^T B`` dot forms and per-head ``[R, R]`` transposes
ran 9x slower than the dense XLA path):

* dot_general forms are ``A @ B`` / ``A @ B^T`` everywhere except the
  inherently-transposed weight-grad (``dfs^T @ hd``, the flash-attention
  dV form);
* both adjacency orientations are passed in from XLA so the kernel
  never transposes an ``[R, R]`` tile;
* the attention matrix is *built* in the orientation each pass
  consumes: forward in ``[dst, src]`` (softmax reduces over lanes; the
  aggregation is then a plain AB matmul), backward in ``[src, dst]``;
* in-kernel transposes are limited to ``[R, 1] -> [1, R]`` vectors.

Dropout matches the framework's counter-hash scheme (ops/dropout.py):
feature dropout is **bit-identical** to the unfused path (same murmur3
hash of (seed, global flat index)); attention dropout uses the same
hash construction over (src, dst) edge indices (the unfused path draws
bernoulli masks there because H < 32 lanes, so masks differ draw-by-
draw but match in distribution and rate).  The wrapper consumes
``rng.next()`` in the same order as the unfused path, keeping every
downstream dropout aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sessionrec_tpu.ops.masked import NEG_INF

_GOLDEN = 0x9E3779B9
_HEAD_MIX = 0x27D4EB2F


def _hash_keep(seed, idx, rate: float):
    """murmur3-finalizer keep mask of uint32 flat indices (ops/dropout.py)."""
    h = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(_GOLDEN))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    keep = 1.0 - rate
    thr = jnp.uint32(min(int(keep * 4294967296.0), 4294967295))
    return h < thr


def _feat_drop(x, seed, rate: float, row_offset):
    """Bit-identical to ops/dropout.py on the ``[B*N, D]`` feature view."""
    if rate == 0.0:
        return x
    R, C = x.shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, (R, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (R, C), 1)
    idx = (rows + jnp.uint32(row_offset)) * jnp.uint32(C) + cols
    keep = _hash_keep(seed, idx, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), jnp.float32)
    return jnp.where(keep, x * scale.astype(x.dtype), jnp.zeros_like(x))


def _attn_drop(a, seed, rate: float, row_offset, total_rows: int, head,
               dst_major: bool):
    """Hash dropout over an [R, R] attention tile.  The element index is
    the global (src, dst) node pair — identical whether the tile is laid
    out [src, dst] (``dst_major=False``, backward) or [dst, src]
    (``dst_major=True``, forward), so forward and backward regenerate
    the same mask.  ``head`` (static or traced) folds into the seed."""
    if rate == 0.0:
        return a
    R = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.uint32, (R, R), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (R, R), 1)
    off = jnp.uint32(row_offset)
    src, dst = (cols, rows) if dst_major else (rows, cols)
    idx = (src + off) * jnp.uint32(total_rows) + (dst + off)
    mixed = seed.astype(jnp.uint32) \
        + jnp.uint32(head).astype(jnp.uint32) * jnp.uint32(_HEAD_MIX)
    keep = _hash_keep(mixed, idx, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), jnp.float32)
    return jnp.where(keep, a * scale.astype(a.dtype), jnp.zeros_like(a))


def _masked_softmax(z, mask_bool, axis: int):
    """ops/masked.py:masked_softmax replicated op-for-op (f32
    exp-normalise, finite NEG_INF, safe denom)."""
    e = jnp.where(mask_bool, z.astype(jnp.float32), NEG_INF)
    m = jnp.max(e, axis=axis, keepdims=True)
    m = jnp.maximum(m, NEG_INF * 0.5)
    ex = jnp.where(mask_bool, jnp.exp(e - m), 0.0)
    s = jnp.sum(ex, axis=axis, keepdims=True)
    return ex / jnp.maximum(s, jnp.finfo(jnp.float32).tiny)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _leaky(z):
    return jnp.where(z >= 0, z, z * 0.2)


def _head_logits(hd, w_ref, al_ref, ar_ref, cdt, col_is_r):
    """fs_h = hd @ W_h^T [R, F] and the attention logits in the exact
    orientations the caller consumes — ``col`` as [R, 1] and ``row`` as
    [1, R] — each produced DIRECTLY by a matvec against fs.  A [R, 1] ->
    [1, R] vector transpose in Mosaic is a scalar-core relayout (~ms per
    kernel at this grid size, measured); these matvecs replace it with
    MXU work.

    ``col_is_r``: 'er' for the forward ([dst, src]: er is the column),
    'el' for the backward ([src, dst]: el is the column).

    ``al_ref``/``ar_ref`` are ``(1, 1, F)`` blocks of the ``[H, 1, F]``
    attention params (a ``(1, F)`` block of ``[H, F]`` would violate the
    sublane-divisibility rule)."""
    fs = _dot(hd, w_ref[:], ((1,), (1,))).astype(cdt)
    al, ar = al_ref[0], ar_ref[0]                           # [1, F]
    cvec, rvec = (ar, al) if col_is_r == "er" else (al, ar)
    # all-f32 matvecs: Mosaic requires a 32-bit matmul accumulator and
    # miscompiles mixed bf16xbf16->f32 for these vector shapes
    fs32 = fs.astype(jnp.float32)
    col = _dot(fs32, cvec.astype(jnp.float32), ((1,), (1,)))    # [R, 1]
    row = _dot(rvec.astype(jnp.float32), fs32, ((1,), (1,)))    # [1, R]
    return fs, col, row


def _fwd_kernel(h_ref, adj_ref, adjT_ref, seeds_ref,
                w1_ref, al1_ref, ar1_ref, b1_ref,
                w2_ref, al2_ref, ar2_ref, b2_ref,
                out_ref, acc_ref, *, N, H, F, feat_drop, attn_drop,
                total_rows):
    Bb = h_ref.shape[0]
    D = h_ref.shape[2]
    R = Bb * N
    cdt = h_ref.dtype
    i = pl.program_id(0)
    h = pl.program_id(1)
    row_off = i * R

    hflat = h_ref[:].reshape(R, D)
    # attention runs in [dst, src] orientation: conv1's mask is then the
    # TRANSPOSED adjacency, conv2's (reversed graph) the adjacency itself
    masksT = (adjT_ref[0] != 0, adj_ref[0] != 0)
    convs = ((masksT[0], w1_ref, al1_ref, ar1_ref, b1_ref, 0, 1),
             (masksT[1], w2_ref, al2_ref, ar2_ref, b2_ref, 2, 3))
    for ci, (maskT, w_ref, al_ref, ar_ref, b_ref, fs_i, as_i) in \
            enumerate(convs):
        hd = _feat_drop(hflat, seeds_ref[fs_i], feat_drop, row_off)
        fs, er_col, el_row = _head_logits(hd, w_ref, al_ref, ar_ref, cdt,
                                          "er")
        zT = _leaky(er_col.astype(jnp.float32)
                    + el_row.astype(jnp.float32))           # [dst, src]
        aT = _masked_softmax(zT, maskT, axis=1).astype(cdt)
        aT = _attn_drop(aT, seeds_ref[as_i], attn_drop, row_off,
                        total_rows, h, dst_major=True)
        rst = _dot(aT, fs, ((1,), (0,))).astype(cdt)        # [R, F]
        val = (rst + hd + b_ref[:].astype(cdt)).reshape(Bb, N, F)
        if ci == 0:
            acc_ref[:, 0] = val
        else:
            acc_ref[:, 0] += val

    # out_ref holds the running head-max (its block is revisited
    # consecutively across the h grid dimension, staying in VMEM)
    @pl.when(h == 0)
    def _first():
        out_ref[:] = acc_ref[:, 0]

    @pl.when(h > 0)
    def _rest():
        out_ref[:] = jnp.maximum(out_ref[:], acc_ref[:, 0])


def _bwd_kernel(h_ref, adj_ref, adjT_ref, seeds_ref,
                w1_ref, al1_ref, ar1_ref, b1_ref,
                w2_ref, al2_ref, ar2_ref, b2_ref,
                acc_ref, g_ref,
                dh_ref, dw1_ref, dal1_ref, dar1_ref, db1_ref,
                dw2_ref, dal2_ref, dar2_ref, db2_ref,
                dw_s, dal_s, dar_s, db_s, dhd_s,
                *, N, H, F, feat_drop, attn_drop, total_rows):
    Bb = h_ref.shape[0]
    D = h_ref.shape[2]
    R = Bb * N
    cdt = h_ref.dtype
    i = pl.program_id(0)
    h = pl.program_id(1)
    nb = pl.num_programs(0)
    row_off = i * R
    hflat = h_ref[:].reshape(R, D)
    g = g_ref[:].reshape(R, F).astype(jnp.float32)

    @pl.when((i == 0) & (h == 0))
    def _init():
        for ref in (dw_s, dal_s, dar_s, db_s):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    # head-max backward: split g evenly across argmax ties (jnp.max VJP),
    # recomputed from the saved per-head acc.  All head indices here are
    # STATIC (the traced grid-head h is matched by predicated selects) —
    # Mosaic's dynamic indexing on tiled dims is not relied upon.
    mx = acc_ref[:, 0].reshape(R, F).astype(jnp.float32)
    for hh in range(1, H):
        mx = jnp.maximum(mx, acc_ref[:, hh].reshape(R, F)
                         .astype(jnp.float32))
    cnt = jnp.zeros((R, F), jnp.float32)
    acc_h = jnp.zeros((R, F), jnp.float32)
    for hh in range(H):
        a32 = acc_ref[:, hh].reshape(R, F).astype(jnp.float32)
        cnt = cnt + (a32 == mx).astype(jnp.float32)
        acc_h = jnp.where(h == hh, a32, acc_h)
    dacc = jnp.where(acc_h == mx, g / cnt, 0.0)             # [R, F] f32
    dacc_c = dacc.astype(cdt)

    # backward works in [src, dst] orientation: conv1 masks with the
    # adjacency, conv2 with its transpose
    masks = (adj_ref[0] != 0, adjT_ref[0] != 0)
    convs = ((masks[0], w1_ref, al1_ref, ar1_ref, 0, 1),
             (masks[1], w2_ref, al2_ref, ar2_ref, 2, 3))
    for ci, (mask, w_ref, al_ref, ar_ref, fs_i, as_i) in enumerate(convs):
        hd = _feat_drop(hflat, seeds_ref[fs_i], feat_drop, row_off)
        fs, el_col, er_row = _head_logits(hd, w_ref, al_ref, ar_ref, cdt,
                                          "el")
        zraw = el_col.astype(jnp.float32) \
            + er_row.astype(jnp.float32)                    # [src, dst]
        a0 = _masked_softmax(_leaky(zraw), mask, axis=0)
        a = _attn_drop(a0.astype(cdt), seeds_ref[as_i], attn_drop,
                       row_off, total_rows, h, dst_major=False)
        da = _dot(fs, dacc_c, ((1,), (1,)))                 # [src, dst] f32
        dfs = _dot(a, dacc_c, ((1,), (0,)))                 # [R, F] f32
        da = _attn_drop(da, seeds_ref[as_i], attn_drop, row_off,
                        total_rows, h, dst_major=False)
        t = jnp.sum(a0 * da, axis=0, keepdims=True)
        dz = a0 * (da - t)
        dz = jnp.where(zraw >= 0, dz, dz * 0.2)
        del_col = jnp.sum(dz, axis=1, keepdims=True)        # [R, 1] (src)
        der_row = jnp.sum(dz, axis=0, keepdims=True)        # [1, R] (dst)
        der_col = jnp.transpose(der_row)                    # [R, 1]
        fs_f32 = fs.astype(jnp.float32)
        al32 = al_ref[0].astype(jnp.float32)
        ar32 = ar_ref[0].astype(jnp.float32)
        dfs = dfs + del_col * al32 + der_col * ar32
        # per-(conv, head) accumulators indexed on the leading (batch)
        # dim only: s = ci*H + h (traced h is fine on an untiled dim)
        s = ci * H + h
        dal_s[s] = dal_s[s] + jnp.sum(del_col * fs_f32, axis=0,
                                      keepdims=True)
        dar_s[s] = dar_s[s] + jnp.sum(der_col * fs_f32, axis=0,
                                      keepdims=True)
        db_s[s] = db_s[s] + jnp.sum(dacc, axis=0, keepdims=True)
        dfs_c = dfs.astype(cdt)
        # weight grad (flash dV form) + incremental input grad
        dw_s[s] = dw_s[s] + _dot(dfs_c, hd, ((0,), (0,)))
        dhd = dacc + _dot(dfs_c, w_ref[:], ((1,), (0,)))    # [R, D] f32

        @pl.when(h == 0)
        def _set():
            dhd_s[ci] = dhd

        @pl.when(h > 0)
        def _add():
            dhd_s[ci] = dhd_s[ci] + dhd

    @pl.when(h == H - 1)
    def _emit_dh():
        dh = _feat_drop(dhd_s[0], seeds_ref[0], feat_drop, row_off) \
            + _feat_drop(dhd_s[1], seeds_ref[2], feat_drop, row_off)
        dh_ref[:] = dh.astype(cdt).reshape(Bb, N, D)

    @pl.when((i == nb - 1) & (h == H - 1))
    def _emit_wgrads():
        dw1_ref[:] = dw_s[0:H].reshape(H * F, D)
        dw2_ref[:] = dw_s[H:2 * H].reshape(H * F, D)
        dal1_ref[:] = dal_s[0:H]
        dal2_ref[:] = dal_s[H:2 * H]
        dar1_ref[:] = dar_s[0:H]
        dar2_ref[:] = dar_s[H:2 * H]
        db1_ref[:] = db_s[0:H, 0]
        db2_ref[:] = db_s[H:2 * H, 0]


def block_diag_adj(adj, block: int):
    """[B, N, N] -> [B/block, block*N, block*N] block-diagonal batches.

    Built in XLA before the kernel call (one broadcast-multiply with a
    block-identity; XLA fuses it into the materialisation of the
    kernel operand)."""
    B, N, _ = adj.shape
    nb = B // block
    a4 = adj.reshape(nb, block, N, N)
    eye = jnp.eye(block, dtype=adj.dtype)
    big = a4[:, :, :, None, :] * eye[None, :, None, :, None]
    return big.reshape(nb, block * N, block * N)


def _pick_block(B: int, N: int, dtype) -> int:
    """Sessions per grid step.

    Prefer the largest Bb <= 640/N rows with R = Bb*N a multiple of 128
    (lane-aligned [R, R] tiles compile and run much better than padded
    ones) that divides B; fall back to R ~ 320 otherwise."""
    best = 0
    for bb in range(min(B, max(640 // N, 1)), 0, -1):
        if B % bb == 0 and (bb * N) % 128 == 0:
            best = bb
            break
    if best:
        return best
    bb = max(1, 320 // N)
    while bb > 1 and B % bb:
        bb -= 1
    return bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg, h, adj_big, adjT_big, seeds,
           w1, al1, ar1, b1, w2, al2, ar2, b2):
    out, _ = _fused_fwd(cfg, h, adj_big, adjT_big, seeds, w1, al1, ar1, b1,
                        w2, al2, ar2, b2)
    return out


def _common_in_specs(Bb, N, R, D, F):
    whead = pl.BlockSpec((F, D), lambda i, h: (h, 0),
                         memory_space=pltpu.VMEM)
    ahead = pl.BlockSpec((1, 1, F), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    bhead = pl.BlockSpec((1, F), lambda i, h: (0, h),
                         memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec((Bb, N, D), lambda i, h: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # h
        pl.BlockSpec((1, R, R), lambda i, h: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # adj_big
        pl.BlockSpec((1, R, R), lambda i, h: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # adjT_big
        pl.BlockSpec(memory_space=pltpu.SMEM),              # seeds
        whead, ahead, ahead, bhead,                         # conv1 params
        whead, ahead, ahead, bhead,                         # conv2 params
    ]


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fused_fwd(cfg, h, adj_big, adjT_big, seeds,
               w1, al1, ar1, b1, w2, al2, ar2, b2):
    N, H, F, feat_drop, attn_drop, interpret = cfg
    B, _, D = h.shape
    Bb = adj_big.shape[1] // N
    R = Bb * N
    nb = B // Bb
    kern = functools.partial(_fwd_kernel, N=N, H=H, F=F,
                             feat_drop=feat_drop, attn_drop=attn_drop,
                             total_rows=B * N)
    out, acc = pl.pallas_call(
        kern,
        grid=(nb, H),
        in_specs=_common_in_specs(Bb, N, R, D, F),
        out_specs=[
            pl.BlockSpec((Bb, N, F), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # out (head max)
            pl.BlockSpec((Bb, 1, N, F), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),          # acc (per head)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, F), h.dtype),
            jax.ShapeDtypeStruct((B, H, N, F), h.dtype),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(h, adj_big, adjT_big, seeds, w1, al1, ar1, b1, w2, al2, ar2, b2)
    return out, (h, adj_big, adjT_big, seeds, w1, al1, ar1, b1,
                 w2, al2, ar2, b2, acc)


def _fused_bwd(cfg, res, g):
    N, H, F, feat_drop, attn_drop, interpret = cfg
    (h, adj_big, adjT_big, seeds, w1, al1, ar1, b1, w2, al2, ar2, b2,
     acc) = res
    B, _, D = h.shape
    Bb = adj_big.shape[1] // N
    R = Bb * N
    nb = B // Bb
    kern = functools.partial(_bwd_kernel, N=N, H=H, F=F,
                             feat_drop=feat_drop, attn_drop=attn_drop,
                             total_rows=B * N)
    fixed = pl.BlockSpec(memory_space=pltpu.VMEM)
    wg = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    outs = pl.pallas_call(
        kern,
        grid=(nb, H),
        in_specs=_common_in_specs(Bb, N, R, D, F) + [
            pl.BlockSpec((Bb, H, N, F), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # acc
            pl.BlockSpec((Bb, N, F), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM)],         # g
        out_specs=[
            pl.BlockSpec((Bb, N, D), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # dh
            fixed, fixed, fixed, fixed,                     # conv1 grads
            fixed, fixed, fixed, fixed,                     # conv2 grads
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), h.dtype),
            wg(w1.shape), wg(al1.shape), wg(ar1.shape), wg((H, F)),
            wg(w2.shape), wg(al2.shape), wg(ar2.shape), wg((H, F)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * H, F, D), jnp.float32),         # dw_s
            pltpu.VMEM((2 * H, 1, F), jnp.float32),         # dal_s
            pltpu.VMEM((2 * H, 1, F), jnp.float32),         # dar_s
            pltpu.VMEM((2 * H, 1, F), jnp.float32),         # db_s
            pltpu.VMEM((2, R, D), jnp.float32),             # dhd_s
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(h, adj_big, adjT_big, seeds, w1, al1, ar1, b1, w2, al2, ar2, b2,
      acc, g)
    dh, dw1, dal1, dar1, db1, dw2, dal2, dar2, db2 = outs
    cast = lambda x, ref: x.astype(ref.dtype)
    return (dh, jnp.zeros_like(adj_big), jnp.zeros_like(adjT_big),
            jnp.zeros_like(seeds),
            cast(dw1, w1), cast(dal1, al1), cast(dar1, ar1),
            cast(db1.reshape(b1.shape), b1),
            cast(dw2, w2), cast(dal2, al2), cast(dar2, ar2),
            cast(db2.reshape(b2.shape), b2))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_intra_gat(p1, p2, feat, adj, rng, *, num_heads: int,
                    feat_drop: float, attn_drop: float, training: bool,
                    interpret: bool | None = None):
    """Fused equivalent of

        acc = gat_apply(p1, f, f, adj, rng, ...) \
            + gat_apply(p2, f, f, adj^T, rng, ...)
        out = max(acc, axis=heads)

    (models/layers.py:mshgnn_apply intra part).  ``rng`` is consumed
    exactly as the unfused path would (4 draws: conv1 feat, conv1 attn,
    conv2 feat, conv2 attn; zero-rate sites draw nothing)."""
    B, N, D = feat.shape
    H = num_heads
    F = p1["attn_l"].shape[-1]
    if not training or rng is None:
        feat_drop = attn_drop = 0.0
    seeds = []
    for rate in (feat_drop, attn_drop, feat_drop, attn_drop):
        if rate == 0.0:
            seeds.append(jnp.zeros((), jnp.int32))
        else:
            key = rng.next()
            seeds.append(
                jax.random.key_data(key).ravel()[-1].astype(jnp.int32))
    seeds = jnp.stack(seeds)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bb = _pick_block(B, N, feat.dtype)
    # adjacency stays f32 (Mosaic has no bf16 comparisons); both
    # orientations are prepared in XLA so the kernel never transposes
    adj32 = adj.astype(jnp.float32)
    adj_big = block_diag_adj(adj32, Bb)
    adjT_big = block_diag_adj(jnp.swapaxes(adj32, 1, 2), Bb)
    cfg = (N, H, F, float(feat_drop), float(attn_drop), bool(interpret))
    b1 = p1["bias"].reshape(1, H * F)
    b2 = p2["bias"].reshape(1, H * F)
    # attention params as [H, 1, F] so per-head (1, 1, F) blocks satisfy
    # the sublane-divisibility rule; grads flow back through the reshape
    return _fused(cfg, feat, adj_big, adjT_big, seeds,
                  p1["fc"], p1["attn_l"].reshape(H, 1, F),
                  p1["attn_r"].reshape(H, 1, F), b1,
                  p2["fc"], p2["attn_l"].reshape(H, 1, F),
                  p2["attn_r"].reshape(H, 1, F), b2)
