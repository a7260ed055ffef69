"""SRGNN — gated session-graph network (reference: src/models/srgnn.py:93-148).

Parity notes:
* All parameters init U(-1/sqrt(d), 1/sqrt(d)) (srgnn.py:126-129).
* The reference readout consumes the *pre-GNN* embedding ``feat``, not
  the GNN output ``out`` (srgnn.py:141-142) — the GNN layers receive no
  gradient.  ``readout_on_embedding=False`` opts into the (presumably
  intended) fixed dataflow.
* Scores are ``log(softmax(sr @ E^T))`` over the full catalog.
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
class SRGNN:
    num_items: int
    embedding_dim: int
    num_layers: int
    feat_drop: float = 0.0
    readout_on_embedding: bool = True
    compute_dtype: str = "float32"
    table_dtype: str = "float32"
    # bound by parallel.mesh.with_mesh on sharded runs: routes
    # embedding gathers through the explicit mesh lookup
    mesh: object = None

    graph_kind = "session"
    has_max_norm = False
    has_plain_head = True   # loss is plain (scaled) softmax-CE over catalog
    scale = 1.0
    table_norm = False

    @classmethod
    def from_config(cls, cfg, num_items):
        return cls(num_items=num_items, embedding_dim=cfg.embedding_dim,
                   num_layers=cfg.num_layers, feat_drop=cfg.feat_drop,
                   readout_on_embedding=cfg.readout_on_embedding,
                   compute_dtype=cfg.compute_dtype,
                   table_dtype=getattr(cfg, "table_dtype", "float32"))

    @property
    def padded_items(self):
        return scoring.pad_catalog(self.num_items)

    @property
    def cdt(self):
        """Compute dtype for the hot matmuls (None = float32 everywhere)."""
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
        """Session representation + scoring table: ``(sr, table, new_state)``.

        ``scale * sr @ table^T`` (see ``self.scale``) are the catalog
        logits; apply() turns them into log-probs, the trainer feeds them
        to the fused softmax-CE kernel directly.
        """
        from sessionrec_tpu.graph.batch import SplitBatch
        if isinstance(batch, SplitBatch):
            # length-bucketed batch: the graph-side runs once per
            # sub-block (no BatchNorm anywhere in SRGNN, so the blocks
            # are independent); the catalog side sees the concatenation
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
        out = feat
        for lp in cp["layers"]:
            out = L.srgnn_layer_apply(lp, out, adj, rng,
                                      feat_drop=self.feat_drop,
                                      training=training)
        ro_feat = feat if self.readout_on_embedding else out
        sr_g, _ = L.attn_readout_apply(cp["readout"], {}, ro_feat,
                                       batch.node_mask, batch.last_idx, rng,
                                       feat_drop=self.feat_drop,
                                       training=training)
        sr_l = jnp.take_along_axis(
            ro_feat, batch.last_idx[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        sr = L.linear(cp["fc_sr"], jnp.concatenate([sr_l, sr_g], axis=-1))
        return sr, params["embedding"], state

    def apply(self, params, state, batch, *, training=False, rng=None):
        sr, table, new_state = self.head(params, state, batch,
                                         training=training, rng=rng)
        imask = scoring.item_mask(self.num_items, self.padded_items)
        log_probs = scoring.log_softmax_scores(sr, table, imask,
                                               scale=self.scale,
                                               compute_dtype=self.cdt)
        return log_probs, new_state
