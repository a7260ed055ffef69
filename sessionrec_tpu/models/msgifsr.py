"""MSGIFSR — multi-granularity consecutive-intent-unit session recommender
(WSDM'22 headline model; reference: src/models/msgifsr.py:157-323).

Parity notes:
* All params init U(-1/sqrt(d), 1/sqrt(d)) (msgifsr.py:224-227), then
  ``alpha`` reset to one-hot on order 1 and ``beta`` to 1
  (msgifsr.py:213-216; beta is unused by forward).
* ``max_norm=1`` embedding: handled as a whole-table projection applied
  by the trainer before each step (see lessr.py docstring for why that is
  exactly torch's semantics here — the full table is looked up every
  forward, msgifsr.py:276).
* ``extra`` (REnorm): split catalog into in-session vs rest per example,
  separate softmax(12·logits) each, blend with the learned 2-way gate
  ``sc_sr[0]`` (only index 0 is ever used, msgifsr.py:283).
* ``fusion`` (IFR): softmax(alpha)-weighted combination of per-order
  scores, else order-1 score (msgifsr.py:311-317).
* MSHGNN's PReLU activation and lint/linq/link linears are declared but
  never used by the reference forward (msgifsr.py:66-68,84-89) — omitted.
* The NaN-scrub branches (msgifsr.py:250-251,294-297 — one of which would
  crash if taken) are unnecessary here: masked softmaxes are NaN-free by
  construction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sessionrec_tpu.models import init as I
from sessionrec_tpu.models import layers as L
from sessionrec_tpu.models.lessr import renorm_rows
from sessionrec_tpu.ops import scoring
from sessionrec_tpu.ops.masked import NEG_INF

# Safe-log floor: far below any reachable softmax probability (min prob of
# softmax(12*logits) with |logits|<=1 over a 10^6 catalog is ~e^-24/10^6
# ~ 4e-17), but a *normal* float32 — a subnormal floor gets flushed to zero
# on some backends and the log-vjp then divides 0/0.
_TINY = 1e-30


@dataclass(frozen=True)
class MSGIFSR:
    num_items: int
    embedding_dim: int
    num_layers: int
    feat_drop: float = 0.0
    reducer: str = "mean"
    order: int = 1
    norm: bool = True
    extra: bool = False
    fusion: bool = False
    compute_dtype: str = "float32"
    table_dtype: str = "float32"
    # bound by parallel.mesh.with_mesh on sharded runs: routes
    # embedding gathers through the explicit mesh lookup
    mesh: object = None

    graph_kind = "ccs"
    has_max_norm = True
    num_heads = 8
    scale = 12.0

    @classmethod
    def from_config(cls, cfg, num_items):
        return cls(num_items=num_items, embedding_dim=cfg.embedding_dim,
                   num_layers=cfg.num_layers, feat_drop=cfg.feat_drop,
                   reducer=cfg.reducer, order=cfg.order, norm=cfg.norm,
                   extra=cfg.extra, fusion=cfg.fusion,
                   compute_dtype=cfg.compute_dtype,
                   table_dtype=getattr(cfg, "table_dtype", "float32"))

    @property
    def padded_items(self):
        return scoring.pad_catalog(self.num_items)

    @property
    def cdt(self):
        return None if self.compute_dtype == "float32" \
            else jnp.dtype(self.compute_dtype)

    @property
    def has_plain_head(self):
        """Without REnorm the loss reduces to softmax-CE of 12 * the
        order-1 logits (no-fusion takes score[:, 0], msgifsr.py:316-317;
        fusion over K=1 is the identity)."""
        return (not self.extra) and (self.order == 1 or not self.fusion)

    def init(self, key):
        d, K = self.embedding_dim, self.order
        bound = 1.0 / math.sqrt(d)
        ks = jax.random.split(key, 6 + self.num_layers)
        params = {
            "embedding": I.embedding_params(ks[0], self.padded_items, d,
                                            bound=bound)
            .astype(jnp.dtype(self.table_dtype)),
            "alpha": jnp.zeros((K,)).at[0].set(1.0),   # msgifsr.py:213-214
            "beta": jnp.ones((1,)),                    # unused by forward
            "expander": L.init_semantic_expander(ks[1], d, self.reducer, K,
                                                 bound=bound),
            "layers": [L.init_mshgnn(ks[2 + i], d, K, bound=bound,
                                     num_heads=self.num_heads)
                       for i in range(self.num_layers)],
        }
        kro = jax.random.split(ks[-3], 3 * K)
        params["readout"] = {
            # msgifsr.py:113-116: fc_u bias=True, fc_v bias=False
            "fc_u": [I.linear_params(kro[3 * i], d, d, bias=True, bound=bound)
                     for i in range(K)],
            "fc_v": [I.linear_params(kro[3 * i + 1], d, d, bias=False,
                                     bound=bound) for i in range(K)],
            "fc_e": [I.linear_params(kro[3 * i + 2], d, 1, bias=False,
                                     bound=bound) for i in range(K)],
        }
        kfc = jax.random.split(ks[-2], K)
        params["fc_sr"] = [I.linear_params(kfc[i], 2 * d, d, bias=False,
                                           bound=bound) for i in range(K)]
        ksc = jax.random.split(ks[-1], 2 * K)
        params["sc_sr"] = [
            {"l1": I.linear_params(ksc[2 * i], d, d, bias=True, bound=bound),
             "l2": I.linear_params(ksc[2 * i + 1], d, 2, bias=False,
                                   bound=bound)}
            for i in range(K)]
        return params, {}

    def project_params(self, params):
        params = dict(params)
        params["embedding"] = renorm_rows(params["embedding"], 1.0)
        return params

    # -- pieces ------------------------------------------------------------

    def _embed_levels(self, params, cp, batch, rng, training):
        cdt = self.cdt
        feats = []
        for l in range(1, self.order + 1):
            lv = batch.levels[l - 1]
            # gathered rows always move to the compute dtype (the table
            # itself may be stored bf16 independently of compute_dtype)
            feat = L.embedding_lookup(params["embedding"], lv.iid,
                                      self.mesh) \
                .astype(cdt or jnp.float32)                 # [B, Nk, k, d]
            feat = L.dropout(rng, feat, self.feat_drop, training)
            feat = L.semantic_expander_apply(cp["expander"], feat, l,
                                             self.reducer)
            if self.norm:
                feat = L.l2norm(feat)
            feats.append(feat)
        return feats

    def _readout(self, params, batch, feats):
        """Multi-order attention readout over the *combined* node set
        (msgifsr.py:124-155: all orders' nodes of a graph form one
        attention segment)."""
        all_feat = jnp.concatenate(feats, axis=1)
        all_mask = jnp.concatenate([lv.mask for lv in batch.levels], axis=1)
        outs = []
        for i in range(self.order):
            last = jnp.take_along_axis(
                feats[i], batch.levels[i].last_idx[:, None, None]
                .astype(jnp.int32), axis=1)[:, 0]
            fu = L.linear(params["readout"]["fc_u"][i], all_feat)
            fv = L.linear(params["readout"]["fc_v"][i], last)
            e = L.linear(params["readout"]["fc_e"][i],
                         jax.nn.sigmoid(fu + fv[:, None, :]))
            alpha = L.masked_softmax(e, all_mask[..., None], axis=1)
            rst = jnp.sum(all_feat * alpha, axis=1)
            outs.append(rst)
        return jnp.stack(outs, axis=1)                      # [B, K, d]

    def _session_item_mask(self, batch):
        """[B, P] 0/1: items occurring in the session (level-1 iids)."""
        from sessionrec_tpu.graph.batch import SplitBatch
        if isinstance(batch, SplitBatch):
            return jnp.concatenate([self._session_item_mask(batch.short),
                                    self._session_item_mask(batch.long)],
                                   axis=0)
        lv1 = batch.levels[0]
        B = lv1.iid.shape[0]
        mask = jnp.zeros((B, self.padded_items), dtype=jnp.float32)
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], lv1.iid.shape[:2])
        return mask.at[rows, lv1.iid[:, :, 0]].max(lv1.mask)

    def _session_iids(self, batch):
        """[B, N1] level-1 (unique session item) ids, -1 on padding —
        the REnorm membership input of the fused multi-order loss.  For
        a SplitBatch the short block's narrower id rows pad with -1 to
        the long block's width before concatenation."""
        from sessionrec_tpu.graph.batch import SplitBatch
        if isinstance(batch, SplitBatch):
            a = self._session_iids(batch.short)
            b = self._session_iids(batch.long)
            w = max(a.shape[1], b.shape[1])
            a = jnp.pad(a, ((0, 0), (0, w - a.shape[1])), constant_values=-1)
            b = jnp.pad(b, ((0, 0), (0, w - b.shape[1])), constant_values=-1)
            return jnp.concatenate([a, b], axis=0)
        lv1 = batch.levels[0]
        return jnp.where(lv1.mask.astype(bool), lv1.iid[:, :, 0], -1)

    # -- forward -----------------------------------------------------------

    def _session_repr(self, params, batch, rng, training):
        """Per-order session vectors ``sr [B, K, d]`` + scoring table
        (both in compute dtype when one is set).  ``rng`` is a raw PRNG
        key (or None).  A SplitBatch runs the graph-side once per
        length sub-block and concatenates the session vectors — MSGIFSR
        has no BatchNorm, so the blocks are independent
        (graph/batch.py:SplitBatch)."""
        from sessionrec_tpu.graph.batch import SplitBatch
        if isinstance(batch, SplitBatch):
            rs, rl = L.split_rngs(rng)
            sr_s, _, _ = self._session_repr(params, batch.short, rs, training)
            sr_l, table, cp = self._session_repr(params, batch.long, rl,
                                                 training)
            return jnp.concatenate([sr_s, sr_l], axis=0), table, cp
        rng = L.RngGen(rng) if rng is not None else None
        cdt = self.cdt
        K = self.order
        cp = L.cast_floats({k: params[k] for k in ("expander", "layers",
                                                   "readout", "fc_sr",
                                                   "sc_sr")}, cdt)
        feats = self._embed_levels(params, cp, batch, rng, training)
        h = feats
        for lp in cp["layers"]:
            h = L.mshgnn_apply(lp, h, batch, rng, feat_drop=self.feat_drop,
                               training=training, num_heads=self.num_heads)
        if self.norm:
            h = [L.l2norm(x) for x in h]
        sr_g = self._readout(cp, batch, h)
        sr_l = jnp.stack([
            jnp.take_along_axis(h[i], batch.levels[i].last_idx[:, None, None]
                                .astype(jnp.int32), axis=1)[:, 0]
            for i in range(K)], axis=1)
        sr = jnp.concatenate([sr_l, sr_g], axis=-1)         # [B, K, 2d]
        sr = jnp.stack([L.linear(cp["fc_sr"][i], sr[:, i])
                        for i in range(K)], axis=1)         # [B, K, d]
        if self.norm:
            sr = L.l2norm(sr)
        return sr, params["embedding"], cp

    @property
    def table_norm(self):
        return self.norm

    def head(self, params, state, batch, *, training=False, rng=None):
        """(sr, raw table, new_state) for the fused softmax-CE path
        (valid when ``has_plain_head``; logits scale is 12; the kernel
        folds in l2norm(table) when ``table_norm``)."""
        sr, table, _ = self._session_repr(params, batch, rng, training)
        return sr[:, 0], table, state

    has_multi_head = True

    def head_multi(self, params, state, batch, *, training=False, rng=None):
        """Inputs of the fused REnorm/fusion loss (ops/xent_multi.py):
        ``(sr [B,K,d], raw table, phi [B,K,2] | None, alpha [K],
        iids [B,N] with -1 padding, new_state)``.  ``iids`` are the
        level-1 (unique session item) ids driving REnorm membership —
        the [B, P] session mask of the materialised path never exists."""
        sr, table, cp = self._session_repr(params, batch, rng, training)
        phi = None
        if self.extra:
            sc = cp["sc_sr"][0]
            phi = jax.nn.softmax(
                L.linear(sc["l2"], jax.nn.relu(L.linear(sc["l1"], sr)))
                .astype(jnp.float32), axis=-1)                # [B, K, 2]
        iids = self._session_iids(batch)
        return sr, table, phi, params["alpha"], iids, state

    def apply(self, params, state, batch, *, training=False, rng=None):
        K = self.order
        sr, table, cp = self._session_repr(params, batch, rng, training)
        if self.norm:
            table = L.l2norm(table)
        if self.cdt is not None:
            table = table.astype(self.cdt)
        imask = scoring.item_mask(self.num_items, self.padded_items)
        logits = jnp.einsum("bkd,pd->bkp", sr, table,
                            preferred_element_type=jnp.float32)

        if self.extra:
            # REnorm: separate softmaxes over in-session / out-of-session
            sc = cp["sc_sr"][0]
            phi = jax.nn.softmax(
                L.linear(sc["l2"], jax.nn.relu(L.linear(sc["l1"], sr)))
                .astype(jnp.float32), axis=-1)              # [B, K, 2]
            smask = self._session_item_mask(batch)          # [B, P]
            in_mask = (smask * imask)[:, None, :]
            ex_mask = ((1.0 - smask) * imask)[:, None, :]
            score_in = scoring.masked_catalog_softmax(12.0 * logits, in_mask)
            score_ex = scoring.masked_catalog_softmax(12.0 * logits, ex_mask)
            score = (phi[..., 0:1] * score_in + phi[..., 1:2] * score_ex)
        else:
            score = scoring.masked_catalog_softmax(12.0 * logits,
                                                   imask[None, None, :])

        if K > 1 and self.fusion:
            w = jax.nn.softmax(params["alpha"])[None, :, None]
            score = jnp.sum(score * w, axis=1)
        else:
            score = score[:, 0]

        log_probs = jnp.where(imask.astype(bool),
                              jnp.log(jnp.maximum(score, _TINY)), NEG_INF)
        return log_probs, state
