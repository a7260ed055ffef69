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

    graph_kind = "session"
    has_max_norm = False

    @classmethod
    def from_config(cls, cfg, num_items):
        return cls(num_items=num_items, embedding_dim=cfg.embedding_dim,
                   num_layers=cfg.num_layers, feat_drop=cfg.feat_drop,
                   readout_on_embedding=cfg.readout_on_embedding)

    @property
    def padded_items(self):
        return scoring.pad_catalog(self.num_items)

    def init(self, key):
        d = self.embedding_dim
        bound = 1.0 / math.sqrt(d)
        ks = jax.random.split(key, 3 + self.num_layers)
        params = {
            "embedding": I.embedding_params(ks[0], self.padded_items, d,
                                            bound=bound),
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

    def apply(self, params, state, batch, *, training=False, rng=None):
        rng = L.RngGen(rng) if rng is not None else None
        emb = params["embedding"][batch.node_iid]
        feat = L.dropout(rng, emb, self.feat_drop, training)
        out = feat
        for lp in params["layers"]:
            out = L.srgnn_layer_apply(lp, out, batch.adj, rng,
                                      feat_drop=self.feat_drop,
                                      training=training)
        ro_feat = feat if self.readout_on_embedding else out
        sr_g, _ = L.attn_readout_apply(params["readout"], {}, ro_feat,
                                       batch.node_mask, batch.last_idx, rng,
                                       feat_drop=self.feat_drop,
                                       training=training)
        sr_l = jnp.take_along_axis(
            ro_feat, batch.last_idx[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        sr = L.linear(params["fc_sr"], jnp.concatenate([sr_l, sr_g], axis=-1))
        imask = scoring.item_mask(self.num_items, self.padded_items)
        log_probs = scoring.log_softmax_scores(sr, params["embedding"], imask)
        return log_probs, state
