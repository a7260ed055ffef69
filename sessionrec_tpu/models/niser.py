"""NISER+ — SRGNN with L2-normalised embeddings and scaled softmax
(reference: src/models/niser.py:91-157).

Deltas from SRGNN: embeddings L2-normalised after dropout (niser.py:134-135)
and again before readout (141-142); session representation and catalog
embeddings normalised (147-151); logits scaled by ``scale`` (=12) before
log-softmax (152-156).  Shares the readout-on-embedding quirk.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sessionrec_tpu.models import init as I
from sessionrec_tpu.models import layers as L
from sessionrec_tpu.ops import scoring


@dataclass(frozen=True)
class NISER:
    num_items: int
    embedding_dim: int
    num_layers: int
    feat_drop: float = 0.0
    norm: bool = True
    scale: float = 12.0
    readout_on_embedding: bool = True
    compute_dtype: str = "float32"
    table_dtype: str = "float32"
    # bound by parallel.mesh.with_mesh on sharded runs: routes
    # embedding gathers through the explicit mesh lookup
    mesh: object = None

    graph_kind = "session"
    has_max_norm = False
    has_plain_head = True

    @property
    def table_norm(self):
        """Scoring normalizes the catalog table (folded into the fused
        Pallas kernel on the training path, niser.py:149-151)."""
        return self.norm

    @classmethod
    def from_config(cls, cfg, num_items):
        return cls(num_items=num_items, embedding_dim=cfg.embedding_dim,
                   num_layers=cfg.num_layers, feat_drop=cfg.feat_drop,
                   norm=cfg.norm, scale=cfg.scale,
                   readout_on_embedding=cfg.readout_on_embedding,
                   compute_dtype=cfg.compute_dtype,
                   table_dtype=getattr(cfg, "table_dtype", "float32"))

    @property
    def padded_items(self):
        return scoring.pad_catalog(self.num_items)

    @property
    def cdt(self):
        return None if self.compute_dtype == "float32" \
            else jnp.dtype(self.compute_dtype)

    def init(self, key):
        d = self.embedding_dim
        bound = 1.0 / math.sqrt(d)
        ks = jax.random.split(key, 3 + self.num_layers)
        params = {
            "embedding": I.embedding_params(ks[0], self.padded_items, d,
                                            bound=bound)
            .astype(jnp.dtype(self.table_dtype)),
            "layers": [L.init_srgnn_layer(ks[1 + i], d, bound=bound)
                       for i in range(self.num_layers)],
            "fc_sr": I.linear_params(ks[-2], 2 * d, d, bias=False,
                                     bound=bound),
        }
        params["readout"], _ = L.init_attn_readout(
            ks[-1], d, d, d, bound=bound, batch_norm=False, activation=False)
        return params, {}

    def project_params(self, params):
        return params

    def head(self, params, state, batch, *, training=False, rng=None):
        """(sr, table, new_state); logits = self.scale * sr @
        l2norm(table)^T when ``table_norm`` — the table is returned *raw*
        so the fused kernel can fold the normalization in."""
        from sessionrec_tpu.graph.batch import SplitBatch
        if isinstance(batch, SplitBatch):
            # length-bucketed batch (no BatchNorm in NISER: the blocks
            # are independent; see graph/batch.py:SplitBatch)
            rs, rl = L.split_rngs(rng)
            sr_s, _, _ = self.head(params, state, batch.short,
                                   training=training, rng=rs)
            sr_l, table, new_state = self.head(params, state, batch.long,
                                               training=training, rng=rl)
            return jnp.concatenate([sr_s, sr_l], axis=0), table, new_state
        rng = L.RngGen(rng) if rng is not None else None
        cdt = self.cdt
        cp = L.cast_floats({k: params[k] for k in ("layers", "readout",
                                                   "fc_sr")}, cdt)
        # gathered rows always move to the compute dtype (the table itself
        # may be stored bf16 independently of compute_dtype)
        emb = L.embedding_lookup(params["embedding"], batch.node_iid,
                                 self.mesh).astype(cdt or jnp.float32)
        adj = batch.adj if cdt is None else batch.adj.astype(cdt)
        feat = L.dropout(rng, emb, self.feat_drop, training)
        if self.norm:
            feat = L.l2norm(feat)
        out = feat
        for lp in cp["layers"]:
            out = L.srgnn_layer_apply(lp, out, adj, rng,
                                      feat_drop=self.feat_drop,
                                      training=training)
        ro_feat = feat if self.readout_on_embedding else out
        if self.norm:
            ro_feat = L.l2norm(ro_feat)
        sr_g, _ = L.attn_readout_apply(cp["readout"], {}, ro_feat,
                                       batch.node_mask, batch.last_idx, rng,
                                       feat_drop=self.feat_drop,
                                       training=training)
        sr_l = jnp.take_along_axis(
            ro_feat, batch.last_idx[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        sr = L.linear(cp["fc_sr"], jnp.concatenate([sr_l, sr_g], axis=-1))
        if self.norm:
            sr = L.l2norm(sr)
        return sr, params["embedding"], state

    def apply(self, params, state, batch, *, training=False, rng=None):
        sr, table, new_state = self.head(params, state, batch,
                                         training=training, rng=rng)
        if self.norm:
            table = L.l2norm(table)
        imask = scoring.item_mask(self.num_items, self.padded_items)
        scale = self.scale if self.scale else 1.0
        log_probs = scoring.log_softmax_scores(sr, table, imask, scale=scale,
                                               compute_dtype=self.cdt)
        return log_probs, new_state
