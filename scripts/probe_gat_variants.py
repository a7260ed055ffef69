"""Probe: alternative XLA formulations of the MSHGNN intra-GAT pair.

The order-1 MSHGNN block (two 8-head GATs + residual + head-max) is the
step-time frontier (BENCH_NOTES.md): tiny per-session [20,20]@[20,32]
attention matmuls and ~0.5 ms of layout copies.  This probe times
drop-in variants of the dense formulation on the real chip to find the
fastest XLA-level structure before (or instead of) a Pallas kernel.

Run: python scripts/probe_gat_variants.py [--no-dropout]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sessionrec_tpu.models import init as I
from sessionrec_tpu.models.layers import RngGen, dropout, gat_apply
from sessionrec_tpu.ops.masked import masked_softmax

B, N, D, H = 512, 20, 256, 8
F = D   # DGL GATConv(d, d, H) emits d features PER HEAD
cdt = jnp.bfloat16
DROP = 0.0 if "--no-dropout" in sys.argv else 0.1

p1 = jax.tree_util.tree_map(lambda x: x.astype(cdt),
                            I.gat_params(jax.random.PRNGKey(1), D, D, H,
                                         bound=0.0625))
p2 = jax.tree_util.tree_map(lambda x: x.astype(cdt),
                            I.gat_params(jax.random.PRNGKey(2), D, D, H,
                                         bound=0.0625))
f = jax.random.normal(jax.random.PRNGKey(3), (B, N, D)).astype(cdt)
adj = (jax.random.uniform(jax.random.PRNGKey(4), (B, N, N))
       < 0.2).astype(jnp.float32)


def conv_logits(p, hd):
    """Shared prologue: projection + per-head logits."""
    fs = (hd @ p["fc"].T).reshape(B, N, H, F)
    el = jnp.sum(fs * p["attn_l"], axis=-1)               # [B, N, H]
    er = jnp.sum(fs * p["attn_r"], axis=-1)
    return fs, el, er


def _blockdiag_attn(attn):
    """[H, F] per-head attention vector -> [H*F, H] block-diagonal matrix
    so el = fs2d @ W runs on the MXU instead of a VPU broadcast-reduce."""
    eye = jnp.eye(H, dtype=attn.dtype)                    # [H, H]
    big = attn[:, :, None] * eye[:, None, :]              # [H, F, H]
    return big.reshape(H * F, H)


def one_conv_mmlogits(p, hd, a_adj, rng):
    """dense, but el/er computed as one [B*N, H*F] @ [H*F, 2H] matmul."""
    fs2 = hd @ p["fc"].T                                  # [B, N, H*F]
    fs = fs2.reshape(B, N, H, F)
    W = jnp.concatenate([_blockdiag_attn(p["attn_l"].reshape(H, F)),
                         _blockdiag_attn(p["attn_r"].reshape(H, F))], 1)
    lr_ = jnp.einsum("bnf,fh->bnh", fs2, W)               # [B, N, 2H]
    el, er = lr_[..., :H], lr_[..., H:]
    e = jax.nn.leaky_relu(el[:, :, None, :] + er[:, None, :, :], 0.2)
    a = masked_softmax(e, a_adj[..., None], axis=1)
    a = dropout(rng, a, DROP, True)
    rst = jnp.einsum("bsdh,bshf->bdhf", a, fs)
    return rst + hd[:, :, None, :] + p["bias"].reshape(1, 1, H, F)


def one_conv_dense(p, hd, a_adj, rng):
    fs, el, er = conv_logits(p, hd)
    e = jax.nn.leaky_relu(el[:, :, None, :] + er[:, None, :, :], 0.2)
    a = masked_softmax(e, a_adj[..., None], axis=1)
    a = dropout(rng, a, DROP, True)
    rst = jnp.einsum("bsdh,bshf->bdhf", a, fs)
    return rst + hd[:, :, None, :] + p["bias"].reshape(1, 1, H, F)


def one_conv_vpu(p, hd, a_adj, rng):
    """Aggregation as an unrolled elementwise sum over the 20 source
    positions (VPU outer products) instead of tiny per-head matmuls."""
    fs, el, er = conv_logits(p, hd)
    e = jax.nn.leaky_relu(el[:, :, None, :] + er[:, None, :, :], 0.2)
    a = masked_softmax(e, a_adj[..., None], axis=1)
    a = dropout(rng, a, DROP, True)
    rst = sum(a[:, s, :, :, None] * fs[:, s, None, :, :] for s in range(N))
    return rst + hd[:, :, None, :] + p["bias"].reshape(1, 1, H, F)


def one_conv_bigmat(p, hd, a_adj, rng):
    """Aggregation as ONE [B,N,N] x [B,N,D] batched matmul by expanding
    the [B,s,d,h] attention to a head-blocked [B, s*? ] ... uses the
    block-diagonal-over-heads trick per session: a_hd [B, d, s, h] ->
    scores picked per head via select.  rst[b,d,hf] = sum_s A_h[b,d,s] *
    fs[b,s,hf] cannot fold h into one matmul; instead do H on the BATCH
    of a dot_general with (b) batch and contracted s, looped over h but
    with F*? ... kept as per-head loop for comparison."""
    fs, el, er = conv_logits(p, hd)
    e = jax.nn.leaky_relu(el[:, :, None, :] + er[:, None, :, :], 0.2)
    a = masked_softmax(e, a_adj[..., None], axis=1)
    a = dropout(rng, a, DROP, True)
    outs = []
    for h in range(H):
        outs.append(jnp.einsum("bsd,bsf->bdf", a[..., h], fs[:, :, h]))
    rst = jnp.stack(outs, axis=2)
    return rst + hd[:, :, None, :] + p["bias"].reshape(1, 1, H, F)


def one_conv_headmajor(p, hd, a_adj, rng):
    """Attention tensors laid out [B, H, s, d] (head next to batch) so the
    minor dims are (s, d) = (20, 20) instead of (d, H) = (20, 8) — less
    lane-padding waste in the elementwise soup."""
    fs, el, er = conv_logits(p, hd)
    elh = jnp.transpose(el, (0, 2, 1))                    # [B, H, s]
    erh = jnp.transpose(er, (0, 2, 1))                    # [B, H, d]
    e = jax.nn.leaky_relu(elh[:, :, :, None] + erh[:, :, None, :], 0.2)
    a = masked_softmax(e, a_adj[:, None, :, :], axis=2)   # [B, H, s, d]
    a = dropout(rng, a, DROP, True)
    fsh = jnp.transpose(fs, (0, 2, 1, 3))                 # [B, H, s, F]
    rst = jnp.einsum("bhsd,bhsf->bdhf", a, fsh)
    return rst + hd[:, :, None, :] + p["bias"].reshape(1, 1, H, F)


def stacked_pair(p1, p2, f, key):
    """Both direction convs computed as ONE set of double-width ops: the
    [2, ...]-stacked tensors halve the op count of the attention soup
    (one masked softmax / dropout / einsum at 2x width instead of two)."""
    rng = RngGen(key)
    hd1 = dropout(rng, f, DROP, True)
    hd2 = dropout(rng, f, DROP, True)
    hds = jnp.stack([hd1, hd2])                           # [2, B, N, D]
    fcs = jnp.stack([p1["fc"], p2["fc"]])                 # [2, H*F, D]
    fs = jnp.einsum("cbnd,cfd->cbnf", hds, fcs).reshape(2, B, N, H, F)
    al = jnp.stack([p1["attn_l"], p2["attn_l"]]).reshape(2, 1, 1, H, F)
    ar = jnp.stack([p1["attn_r"], p2["attn_r"]]).reshape(2, 1, 1, H, F)
    el = jnp.sum(fs * al, axis=-1)                        # [2, B, N, H]
    er = jnp.sum(fs * ar, axis=-1)
    adjs = jnp.stack([adj, jnp.swapaxes(adj, 1, 2)])      # [2, B, N, N]
    e = jax.nn.leaky_relu(el[:, :, :, None, :] + er[:, :, None, :, :], 0.2)
    a = masked_softmax(e, adjs[..., None], axis=2)
    a = dropout(rng, a, DROP, True)
    rst = jnp.einsum("cbsdh,cbshf->cbdhf", a, fs)
    bias = jnp.stack([p1["bias"], p2["bias"]]).reshape(2, 1, 1, H, F)
    acc = jnp.sum(rst + hds[:, :, :, None, :] + bias, axis=0)
    return jnp.max(acc, axis=2)


def make_pair(one_conv):
    def pair(p1, p2, f, key):
        rng = RngGen(key)
        hd = dropout(rng, f, DROP, True)
        acc = one_conv(p1, hd, adj, rng)
        hd2 = dropout(rng, f, DROP, True)
        acc = acc + one_conv(p2, hd2, jnp.swapaxes(adj, 1, 2), rng)
        return jnp.max(acc, axis=2)
    return pair


def ref_pair(p1, p2, f, key):
    rng = RngGen(key)
    kw = dict(num_heads=H, feat_drop=DROP, attn_drop=DROP, training=True)
    acc = gat_apply(p1, f, f, adj, rng, **kw)
    acc = acc + gat_apply(p2, f, f, jnp.swapaxes(adj, 1, 2), rng, **kw)
    return jnp.max(acc, axis=2)


def window(fn_call, sync, n=30, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            out = fn_call()
        sync(out)
        best = min(best, (time.time() - t0) / n * 1e3)
    return best


def bench(name, fn):
    loss = jax.jit(lambda p1, p2, f, key:
                   jnp.sum(fn(p1, p2, f, key).astype(jnp.float32) ** 2))
    vg = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    key = jax.random.PRNGKey(0)
    l = loss(p1, p2, f, key)
    g = vg(p1, p2, f, key)
    np.asarray(l); np.asarray(jax.tree_util.tree_leaves(g)[0])
    fwd_ms = window(lambda: loss(p1, p2, f, key),
                    lambda o: np.asarray(o))
    bwd_ms = window(lambda: vg(p1, p2, f, key),
                    lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0][0, :8]))
    print(f"{name:10s} fwd {fwd_ms:6.2f} ms   grad {bwd_ms:6.2f} ms   "
          f"loss {float(l):.1f}", flush=True)


if __name__ == "__main__":
    bench("ref", ref_pair)
    bench("dense", make_pair(one_conv_dense))
    bench("vpu", make_pair(one_conv_vpu))
    bench("perhead", make_pair(one_conv_bigmat))
    bench("headmajor", make_pair(one_conv_headmajor))
    bench("stacked", stacked_pair)
    bench("mmlogits", make_pair(one_conv_mmlogits))
    bench("ref2", ref_pair)
