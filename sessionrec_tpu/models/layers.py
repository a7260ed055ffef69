"""Functional neural layers over the dense graph layout.

Each layer is an ``init_*(key, ...) -> params`` / ``*_apply(params, ...)``
pair.  Dropout takes an ``RngGen`` (None disables).  BatchNorm threads an
explicit ``(params, state)`` and returns updated running stats when
training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sessionrec_tpu.models import init as I
from sessionrec_tpu.ops.gru import gru_cell, gru_scan, masked_mailbox_gru
from sessionrec_tpu.ops.masked import masked_mean, masked_softmax


class RngGen:
    """Derives per-site PRNG keys on demand (trace-safe).

    ``fold_in(key, counter)`` instead of a ``split`` chain: each site's
    key depends only on (key, site index), so the ~6 per-step threefry
    derivations are instruction-level parallel instead of a sequential
    dependency chain (the chain profiled ~124 us/step on the headline
    config — ILP-free scalar u32 ops).  Site keys remain independent
    and deterministic; draws differ from the split-chain scheme, which
    only reshuffles dropout masks (statistically identical)."""

    def __init__(self, key):
        self.key = key
        self._i = 0

    def next(self):
        self._i += 1
        return jax.random.fold_in(self.key, self._i)


def embedding_lookup(table, ids, mesh=None):
    """``table[ids]`` — routed through the explicit shard_map'd lookup
    when the model is mesh-bound (parallel/lookup.py pins the collective
    layout GSPMD gets wrong for the gather's backward); the plain gather
    otherwise.  Callers cast the gathered rows to the compute dtype."""
    if mesh is None:
        return table[ids]
    from sessionrec_tpu.parallel.lookup import sharded_lookup
    return sharded_lookup(mesh, table, ids)


def split_parts_rngs(batch, rng):
    """Flatten a (possibly nested) SplitBatch into leaf blocks plus one
    independent key per block, derived along the same recursive
    ``split_rngs`` tree the recursive model heads use — at depth 1 this
    reproduces the two-tier derivation exactly."""
    from sessionrec_tpu.graph.batch import SplitBatch
    if not isinstance(batch, SplitBatch):
        return [batch], [rng]
    rs, rl = split_rngs(rng)
    ps, ks = split_parts_rngs(batch.short, rs)
    pl, kl = split_parts_rngs(batch.long, rl)
    return ps + pl, ks + kl


def split_rngs(rng):
    """Two independent per-sub-block keys for a SplitBatch forward (the
    blocks have different shapes, so one shared stream cannot serve
    both).  Dropout draws therefore differ from an unsplit forward —
    a different random stream, statistically identical."""
    if rng is None:
        return None, None
    return jax.random.fold_in(rng, 0x5170), jax.random.fold_in(rng, 0x10f6)


def cast_floats(tree, dtype):
    """Cast every floating leaf of a param pytree to ``dtype`` (no-op for
    None).  Used to run layer compute in bfloat16 while the master params
    (and optimizer state) stay float32 — gradients flow back through the
    cast, so updates land on the f32 masters."""
    if dtype is None:
        return tree

    def c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(c, tree)


def dropout(rng, x, rate: float, training: bool):
    """Inverted dropout matching torch nn.Dropout semantics.

    Routes through the Pallas hardware-PRNG kernel on TPU
    (ops/dropout.py) — threefry mask generation was ~1.5 ms/step on the
    MSGIFSR bench config."""
    if not training or rate == 0.0 or rng is None:
        return x
    from sessionrec_tpu.ops.dropout import dropout as fused_dropout
    return fused_dropout(rng.next(), x, rate)


def linear(p, x):
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


def prelu(p, x):
    return jnp.where(x >= 0, x, p["a"] * x)


def l2norm(x, eps=1e-12, axis=-1):
    """torch F.normalize: x / max(||x||, eps) (norm computed in f32)."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps).astype(x.dtype)


# ---------------------------------------------------------------------------
# Masked BatchNorm1d (torch semantics incl. running stats)
# ---------------------------------------------------------------------------

def bn_batch_moments(parts):
    """Joint masked BatchNorm batch statistics across several arrays.

    ``parts`` is a list of ``(x [..., C], mask [...] | None)``.  Returns
    ``(mean [C], biased var [C], n)`` in float32, computed exactly as the
    single-array path in ``batchnorm_apply`` (same two-pass form: mean
    first, then centred second moment) so a SplitBatch LESSR forward
    reproduces the unsplit batch's statistics up to float summation
    order (graph/batch.py:SplitBatch).
    """
    def flat(x, mask):
        C = x.shape[-1]
        xf = x.astype(jnp.float32).reshape(-1, C)
        if mask is None:
            mf = jnp.ones((xf.shape[0], 1), jnp.float32)
        else:
            mf = mask.reshape(-1, 1).astype(jnp.float32)
        return xf, mf

    flats = [flat(x, m) for x, m in parts]
    n = jnp.maximum(sum(jnp.sum(mf) for _, mf in flats), 1.0)
    mean = sum(jnp.sum(xf * mf, 0) for xf, mf in flats) / n
    var = sum(jnp.sum(((xf - mean) ** 2) * mf, 0) for xf, mf in flats) / n
    return mean, var, n


def batchnorm_apply(p, state, x, mask=None, *, training, momentum=0.1,
                    eps=1e-5, moments=None):
    """BatchNorm over all leading axes of ``x [..., C]``.

    ``mask`` (same leading shape) restricts statistics to real rows — in
    the reference BN sees only real (unpadded) nodes, so padded rows must
    not contaminate batch statistics.  Running update uses torch's
    unbiased variance; normalisation uses the biased one.  Statistics and
    the normalisation itself always run in float32 (bf16 variance is
    numerically unusable); output returns in the input dtype.

    ``moments`` — precomputed ``(mean, biased var, n)`` from
    ``bn_batch_moments``: used instead of this array's own statistics
    when the true batch spans several arrays (SplitBatch sub-blocks).
    Ignored when not training (running stats apply as usual).
    """
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    C = x.shape[-1]
    xf = x.reshape(-1, C)
    if training:
        if moments is not None:
            mean, var, n = moments
        elif mask is not None:
            mf = mask.reshape(-1, 1).astype(xf.dtype)
            n = jnp.maximum(jnp.sum(mf), 1.0)
            mean = jnp.sum(xf * mf, 0) / n
            var = jnp.sum(((xf - mean) ** 2) * mf, 0) / n
        else:
            n = jnp.asarray(xf.shape[0], xf.dtype)
            mean = jnp.mean(xf, 0)
            var = jnp.mean((xf - mean) ** 2, 0)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = ((x - mean) * jax.lax.rsqrt(var + eps)
         * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32))
    return y.astype(in_dtype), new_state


# ---------------------------------------------------------------------------
# SRGNNLayer (reference: srgnn.py:11-51, duplicated in niser.py:11-49)
# ---------------------------------------------------------------------------

def init_srgnn_layer(key, dim, *, bound):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gru": I.gru_params(k1, 2 * dim, dim, bound=bound),
        "W1": I.linear_params(k2, dim, dim, bias=False, bound=bound),
        "W2": I.linear_params(k3, dim, dim, bias=False, bound=bound),
    }


def srgnn_layer_apply(p, feat, adj, rng, *, feat_drop, training):
    """Gated-GNN step on the weighted session graph.

    Messages use dropped features; the GRU hidden state is the *undropped*
    input feature (srgnn.py:35,45).  Weighted-mean aggregation runs in
    both edge directions; zero-in-degree nodes aggregate to 0 (DGL
    update_all semantics).
    """
    ft = dropout(rng, feat, feat_drop, training)
    # forward: dst v <- sum_u adj[u,v] * ft[u] / sum_u adj[u,v]
    msum_f = jnp.einsum("buv,bud->bvd", adj, ft)
    den_f = jnp.sum(adj, axis=1)  # [B, N] in-weight per dst
    neigh1 = msum_f / jnp.maximum(den_f, 1e-24)[..., None]
    # reverse direction (g.reverse(copy_edata=True), srgnn.py:39)
    msum_r = jnp.einsum("buv,bvd->bud", adj, ft)
    den_r = jnp.sum(adj, axis=2)
    neigh2 = msum_r / jnp.maximum(den_r, 1e-24)[..., None]
    hn = jnp.concatenate([linear(p["W1"], neigh1), linear(p["W2"], neigh2)],
                         axis=-1)
    return gru_cell(p["gru"], hn, feat)


# ---------------------------------------------------------------------------
# AttnReadout (homogeneous; srgnn.py:53-91 / lessr.py:80-118)
# ---------------------------------------------------------------------------

def init_attn_readout(key, in_dim, hidden_dim, out_dim, *, bound,
                      batch_norm=False, activation=False):
    ks = jax.random.split(key, 5)
    p = {
        "fc_u": I.linear_params(ks[0], in_dim, hidden_dim, bias=False, bound=bound),
        "fc_v": I.linear_params(ks[1], in_dim, hidden_dim, bias=True, bound=bound),
        "fc_e": I.linear_params(ks[2], hidden_dim, 1, bias=False, bound=bound),
    }
    state = {}
    if out_dim != in_dim:
        p["fc_out"] = I.linear_params(ks[3], in_dim, out_dim, bias=False,
                                      bound=bound)
    if batch_norm:
        p["bn"], state["bn"] = I.batchnorm_params(in_dim)
    if activation:
        p["act"] = I.prelu_params(out_dim)
    return p, state


def attn_readout_apply(p, state, feat, mask, last_idx, rng, *, feat_drop,
                       training, bn_moments=None):
    """Soft-attention pooling into one session vector per graph."""
    new_state = dict(state)
    if "bn" in p:
        feat, new_state["bn"] = batchnorm_apply(p["bn"], state["bn"], feat,
                                                mask, training=training,
                                                moments=bn_moments)
    feat = dropout(rng, feat, feat_drop, training)
    feat_u = linear(p["fc_u"], feat)                       # [B, N, H]
    f_last = jnp.take_along_axis(
        feat, last_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    feat_v = linear(p["fc_v"], f_last)                     # [B, H]
    e = linear(p["fc_e"], jax.nn.sigmoid(feat_u + feat_v[:, None, :]))
    alpha = masked_softmax(e, mask[..., None], axis=1)     # segment softmax
    rst = jnp.sum(feat * alpha, axis=1)                    # segment sum
    if "fc_out" in p:
        rst = linear(p["fc_out"], rst)
    if "act" in p:
        rst = prelu(p["act"], rst)
    return rst, new_state


# ---------------------------------------------------------------------------
# EOPA (reference: lessr.py:8-42)
# ---------------------------------------------------------------------------

def init_eopa(key, in_dim, out_dim, *, batch_norm=True):
    ks = jax.random.split(key, 4)
    p = {
        "gru": I.gru_params(ks[0], in_dim, in_dim),
        "fc_self": I.linear_params(ks[1], in_dim, out_dim, bias=False),
        "fc_neigh": I.linear_params(ks[2], in_dim, out_dim, bias=False),
        "act": I.prelu_params(out_dim),
    }
    state = {}
    if batch_norm:
        p["bn"], state["bn"] = I.batchnorm_params(in_dim)
    return p, state


def eopa_apply(p, state, feat, mask, mail_idx, mail_mask, rng, *, feat_drop,
               training, bn_moments=None):
    """Edge-order-preserving aggregation.

    The per-node mailbox GRU consumes in-messages in temporal order —
    exactly DGL's edge-insertion-ordered mailbox (lessr.py:21-26).
    """
    new_state = dict(state)
    if "bn" in p:
        feat, new_state["bn"] = batchnorm_apply(p["bn"], state["bn"], feat,
                                                mask, training=training,
                                                moments=bn_moments)
    ft = dropout(rng, feat, feat_drop, training)
    # mailbox gather: mail[b, v, j] = ft[b, mail_idx[b, v, j]].  Written
    # as a one-hot contraction over the N (<=20) source nodes instead of
    # take_along_axis: the row gather and its scatter-add backward were
    # the LESSR step's top cost (5.8 of 9.5 ms device-time — [B*N*D]-row
    # dynamic gathers of 64 B rows, profiled v5e round 4); as a matmul
    # both directions ride the MXU and the one-hot fuses from iota.
    N = feat.shape[1]
    onehot = (mail_idx[..., None] == jnp.arange(N)).astype(ft.dtype)
    mail = jnp.einsum("bvjn,bnd->bvjd", onehot, ft)
    neigh = masked_mailbox_gru(p["gru"], mail, mail_mask)
    rst = linear(p["fc_self"], feat) + linear(p["fc_neigh"], neigh)
    return prelu(p["act"], rst), new_state


# ---------------------------------------------------------------------------
# SGAT (reference: lessr.py:45-77)
# ---------------------------------------------------------------------------

def init_sgat(key, in_dim, hidden_dim, out_dim, *, batch_norm=True):
    ks = jax.random.split(key, 5)
    p = {
        "fc_q": I.linear_params(ks[0], in_dim, hidden_dim, bias=True),
        "fc_k": I.linear_params(ks[1], in_dim, hidden_dim, bias=False),
        "fc_v": I.linear_params(ks[2], in_dim, out_dim, bias=False),
        "fc_e": I.linear_params(ks[3], hidden_dim, 1, bias=False),
        "act": I.prelu_params(out_dim),
    }
    state = {}
    if batch_norm:
        p["bn"], state["bn"] = I.batchnorm_params(in_dim)
    return p, state


def sgat_apply(p, state, feat, mask, sc_adj, rng, *, feat_drop, training,
               bn_moments=None):
    """Shortcut-graph attention: e_uv = fc_e(sigmoid(q_u + k_v)),
    edge-softmax over each destination's in-edges, weighted sum of v_u."""
    new_state = dict(state)
    if "bn" in p:
        feat, new_state["bn"] = batchnorm_apply(p["bn"], state["bn"], feat,
                                                mask, training=training,
                                                moments=bn_moments)
    feat = dropout(rng, feat, feat_drop, training)
    q = linear(p["fc_q"], feat)   # [B, N, H] (src role)
    k = linear(p["fc_k"], feat)   # [B, N, H] (dst role)
    v = linear(p["fc_v"], feat)
    e = linear(p["fc_e"], jax.nn.sigmoid(q[:, :, None, :] + k[:, None, :, :]))
    a = masked_softmax(e, sc_adj[..., None], axis=1)     # edge_softmax by dst
    rst = jnp.einsum("buv,bud->bvd", a[..., 0], v)       # u_mul_e_sum
    return prelu(p["act"], rst), new_state


# ---------------------------------------------------------------------------
# GATConv (vendored DGL layer; reference: gatconv.py:254-319), dense form
# ---------------------------------------------------------------------------

def gat_apply(p, f_src, f_dst, adj, rng, *, num_heads, feat_drop, attn_drop,
              training):
    """8-head additive-attention conv on a (possibly bipartite) relation.

    ``adj [B, Ns, Nd]`` marks edges src->dst.  Residual is identity
    (+h_dst, gatconv.py:306-308) and bias is added per head.  Returns
    ``[B, Nd, H, dh]`` — head reduction happens in the caller (MSHGNN
    takes max over heads, msgifsr.py:84-85).

    Attention logits compute DIRECTLY from the features: DGL forms
    ``el = sum(fs * attn_l)`` on the projected [*, H, dh] tensor
    (gatconv.py:288-291), but that is algebraically
    ``h_src @ (fc^T attn_l)`` — a [d, H] matrix folded from the weights
    once per call.  Two consequences on TPU (measured, o3 trace):
    * the dst-side projection of a BIPARTITE relation disappears
      entirely (``fd`` existed only to produce ``er``) — at MSGIFSR
      order 3 that deletes 8 of the 22 [B*N, d]@[d, H*dh] matmuls;
    * the [B, N, H, dh] x attn multiply-reduce fusions (and their
      backward) leave the step; ``fs`` is consumed only by the
      aggregation matmul.
    Float summation order differs from DGL's (contract d before f), so
    results match to tolerance, not bitwise.
    """
    if f_src is f_dst:
        # homogeneous relation: DGL applies feat_drop once and reuses the
        # tensor for both roles (gatconv.py:283-284) — one mask, not two
        h_src = h_dst = dropout(rng, f_src, feat_drop, training)
    else:
        h_src = dropout(rng, f_src, feat_drop, training)
        h_dst = dropout(rng, f_dst, feat_drop, training)
    B, Ns = h_src.shape[0], h_src.shape[1]
    dh = p["attn_l"].shape[-1]
    fs = (h_src @ p["fc"].T).reshape(B, Ns, num_heads, dh)
    fc3 = p["fc"].reshape(num_heads, dh, -1)              # [H, dh, d]
    w_el = jnp.einsum("hfd,hf->dh", fc3, p["attn_l"])     # [d, H]
    w_er = jnp.einsum("hfd,hf->dh", fc3, p["attn_r"])
    el = h_src @ w_el                                     # [B, Ns, H]
    er = h_dst @ w_er                                     # [B, Nd, H]
    e = jax.nn.leaky_relu(el[:, :, None, :] + er[:, None, :, :], 0.2)
    a = masked_softmax(e, adj[..., None], axis=1)         # softmax over src
    a = dropout(rng, a, attn_drop, training)
    rst = jnp.einsum("bsdh,bshf->bdhf", a, fs)
    rst = rst + h_dst[:, :, None, :]                      # identity residual
    rst = rst + p["bias"].reshape(1, 1, num_heads, dh)
    return rst


# ---------------------------------------------------------------------------
# SemanticExpander (reference: msgifsr.py:14-45)
# ---------------------------------------------------------------------------

def init_semantic_expander(key, dim, reducer: str, order: int, *, bound):
    """One GRU per gram-size >= 2 (the reference allocates ``order`` GRUs
    but only indices 0..order-2 are reachable, msgifsr.py:42)."""
    p = {"grus": [], "Ws": []}
    ks = jax.random.split(key, max(order, 1))
    for i in range(order - 1):
        p["grus"].append(I.gru_params(ks[i], dim, dim, bound=bound))
    if reducer == "concat":
        kws = jax.random.split(jax.random.fold_in(key, 7), max(order - 1, 1))
        for i in range(1, order):
            p["Ws"].append(I.linear_params(kws[i - 1], dim * (i + 1), dim,
                                           bias=True, bound=bound))
    return p


def semantic_expander_apply(p, feat, level: int, reducer: str):
    """Embed a k-gram node set ``feat [B, Nk, k, d]`` -> ``[B, Nk, d]``."""
    if level == 1:
        return feat[:, :, 0, :]
    if reducer == "mean":
        invar = jnp.mean(feat, axis=2)
    elif reducer == "max":
        invar = jnp.max(feat, axis=2)
    elif reducer == "concat":
        B, Nk = feat.shape[0], feat.shape[1]
        invar = linear(p["Ws"][level - 2], feat.reshape(B, Nk, -1))
    else:
        raise ValueError(f"unknown reducer {reducer!r}")
    var = gru_scan(p["grus"][level - 2], feat)            # final hidden
    return 0.5 * invar + 0.5 * var


# ---------------------------------------------------------------------------
# MSHGNN (reference: msgifsr.py:47-91)
# ---------------------------------------------------------------------------

def init_mshgnn(key, dim, order: int, *, bound, num_heads=8):
    """Two HeteroGraphConvs (forward + reversed graph), each a dict of
    GATConvs: one per intra relation + ONE shared 'inter' module applied
    to every inter relation (dgl HeteroGraphConv keys by edge-type name,
    msgifsr.py:58-64)."""
    p = {"conv1": {}, "conv2": {}}
    ks = iter(jax.random.split(key, 2 * (order + 1)))
    for conv in ("conv1", "conv2"):
        for i in range(order):
            p[conv][f"intra{i + 1}"] = I.gat_params(next(ks), dim, dim,
                                                    num_heads, bound=bound)
        p[conv]["inter"] = I.gat_params(next(ks), dim, dim, num_heads,
                                        bound=bound)
    return p


def mshgnn_apply(p, feats, batch, rng, *, feat_drop, training, num_heads=8):
    """Hetero message passing over the CCS batch.

    For each level: GAT over the forward relations (conv1) + GAT over the
    reversed graph (conv2), summed per destination type ('sum' aggregate),
    max over the 8 heads, plus a broadcast per-graph mean of the *input*
    features (msgifsr.py:84-89).

    Stays the SEQUENTIAL dense XLA formulation on purpose — round 4
    measured two cross-application "stacked" forms (all 6K-4 GATConv
    applications of an order-K layer batched on a leading axis; a 5D and
    a flattened-4D variant) and both LOST to this one (46 / 56 ms
    device-time per o3-paper step vs ~30 ms): inside one XLA program the
    sequential chains have no dispatch cost to amortise, and the stacked
    tensors forced ~14 ms of pure layout copies / physical re-tiles that
    XLA never emits for the per-call chains (BENCH_NOTES.md round 4).
    A fused Pallas kernel for the intra pair lost 9x in rounds 2-3 for
    the analogous reason (BENCH_NOTES.md round 3).
    """
    K = batch.order
    kw = dict(num_heads=num_heads, feat_drop=feat_drop, attn_drop=feat_drop,
              training=training)
    out = []
    for l in range(1, K + 1):
        lv = batch.levels[l - 1]
        f = feats[l - 1]
        acc = gat_apply(p["conv1"][f"intra{l}"], f, f, lv.intra_adj, rng, **kw)
        acc = acc + gat_apply(p["conv2"][f"intra{l}"], f, f,
                              jnp.swapaxes(lv.intra_adj, 1, 2), rng, **kw)
        if l == 1:
            for k in range(2, K + 1):
                fk = feats[k - 1]
                # conv1: sk -> s1 inter edges
                acc = acc + gat_apply(p["conv1"]["inter"], fk, f,
                                      batch.inter_out[k - 2], rng, **kw)
                # conv2 (reversed): s1 -> sk edges become sk -> s1
                acc = acc + gat_apply(p["conv2"]["inter"], fk, f,
                                      jnp.swapaxes(batch.inter_in[k - 2],
                                                   1, 2), rng, **kw)
        else:
            acc = acc + gat_apply(p["conv1"]["inter"], feats[0], f,
                                  batch.inter_in[l - 2], rng, **kw)
            acc = acc + gat_apply(p["conv2"]["inter"], feats[0], f,
                                  jnp.swapaxes(batch.inter_out[l - 2], 1, 2),
                                  rng, **kw)
        h = jnp.max(acc, axis=2)                           # head max
        h_mean = masked_mean(f, lv.mask[..., None], axis=1)  # per-graph mean
        out.append(h + h_mean[:, None, :])
    return out
