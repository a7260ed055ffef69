"""LESSR — edge-order-preserving aggregation + shortcut-graph attention
(reference: src/models/lessr.py:121-183).

Parity notes:
* Layers alternate EOPA (even) / SGAT (odd) with dense feature concat:
  layer input width grows by ``embedding_dim`` per layer
  (lessr.py:133-152,174).
* The embedding uses torch ``max_norm=1``: rows touched by a lookup are
  L2-renormed **in place, in the table, at lookup time** (lessr.py:126).
  Since every forward also looks up the *entire* table for the catalog
  logits (lessr.py:182), all rows are renormed every step.  The
  functional equivalent implemented here: ``project_params`` renorms the
  whole table; the trainer applies it at the top of every step (and eval)
  so gradients/updates act on the projected table, exactly like torch's
  data-side renorm.
* No ``reset_parameters``: torch per-module default inits apply
  (see models/init.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sessionrec_tpu.models import init as I
from sessionrec_tpu.models import layers as L
from sessionrec_tpu.ops import scoring


def renorm_rows(table, max_norm=1.0, eps=1e-7):
    """torch Embedding(max_norm) renorm: rows with ||r|| > max_norm are
    scaled by max_norm / (||r|| + eps).  Norms and scales compute in
    float32 regardless of the table's storage dtype (bf16 norms are too
    coarse for a projection boundary)."""
    n = jnp.linalg.norm(table.astype(jnp.float32), axis=-1, keepdims=True)
    scale = jnp.where(n > max_norm, max_norm / (n + eps), 1.0)
    return table * scale.astype(table.dtype)


@dataclass(frozen=True)
class LESSR:
    num_items: int
    embedding_dim: int
    num_layers: int
    batch_norm: bool = True
    feat_drop: float = 0.0
    compute_dtype: str = "float32"
    table_dtype: str = "float32"
    # bound by parallel.mesh.with_mesh on sharded runs: routes
    # embedding gathers through the explicit mesh lookup
    mesh: object = None

    graph_kind = "lessr"
    has_max_norm = True
    has_plain_head = True
    scale = 1.0
    table_norm = False

    @classmethod
    def from_config(cls, cfg, num_items):
        return cls(num_items=num_items, embedding_dim=cfg.embedding_dim,
                   num_layers=cfg.num_layers, batch_norm=cfg.batch_norm,
                   feat_drop=cfg.feat_drop, compute_dtype=cfg.compute_dtype,
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
        ks = jax.random.split(key, 4 + self.num_layers)
        params = {"embedding": I.embedding_params(ks[0], self.padded_items, d)
                  .astype(jnp.dtype(self.table_dtype)),
                  "layers": []}
        state = {"layers": []}
        input_dim = d
        for i in range(self.num_layers):
            if i % 2 == 0:
                p, s = L.init_eopa(ks[1 + i], input_dim, d,
                                   batch_norm=self.batch_norm)
            else:
                p, s = L.init_sgat(ks[1 + i], input_dim, d, d,
                                   batch_norm=self.batch_norm)
            params["layers"].append(p)
            state["layers"].append(s)
            input_dim += d
        params["readout"], state["readout"] = L.init_attn_readout(
            ks[-3], input_dim, d, d, bound=None,
            batch_norm=self.batch_norm, activation=True)
        input_dim += d
        if self.batch_norm:
            params["bn"], state["bn"] = I.batchnorm_params(input_dim)
        params["fc_sr"] = I.linear_params(ks[-2], input_dim, d, bias=False)
        return params, state

    def project_params(self, params):
        params = dict(params)
        params["embedding"] = renorm_rows(params["embedding"], 1.0)
        return params

    def head(self, params, state, batch, *, training=False, rng=None):
        """(sr, table, new_state); logits = sr @ table^T (scale 1).

        A SplitBatch (length-bucketed, graph/batch.py) runs the layers
        once per sub-block, but BatchNorm batch statistics are computed
        JOINTLY across the blocks (layers.bn_batch_moments) — the split
        forward therefore reproduces the unsplit batch's math (and
        running-stat updates) up to float summation order, unlike a
        naive per-block forward whose BN would see different batches.
        """
        parts, keys = L.split_parts_rngs(batch, rng)
        rngs = [L.RngGen(k) if k is not None else None for k in keys]
        return self._head_parts(params, state, parts, rngs, training)

    def _head_parts(self, params, state, parts, rngs, training):
        cdt = self.cdt
        cp = L.cast_floats({k: v for k, v in params.items()
                            if k != "embedding"}, cdt)
        new_state = {"layers": []}
        # gathered rows always move to the compute dtype (the table itself
        # may be stored bf16 independently of compute_dtype)
        feats = [L.embedding_lookup(params["embedding"], b.node_iid,
                                    self.mesh).astype(cdt or jnp.float32)
                 for b in parts]
        if cdt is not None:
            parts = [b.replace(sc_adj=b.sc_adj.astype(cdt)) for b in parts]
        bn_on = self.batch_norm and training and len(parts) > 1
        for i, (lp, ls) in enumerate(zip(cp["layers"], state["layers"])):
            moments = L.bn_batch_moments(
                [(f, b.node_mask) for f, b in zip(feats, parts)]) \
                if bn_on else None
            outs = []
            for b, f, rg in zip(parts, feats, rngs):
                if i % 2 == 0:
                    out, ns = L.eopa_apply(lp, ls, f, b.node_mask,
                                           b.mail_idx, b.mail_mask, rg,
                                           feat_drop=self.feat_drop,
                                           training=training,
                                           bn_moments=moments)
                else:
                    out, ns = L.sgat_apply(lp, ls, f, b.node_mask,
                                           b.sc_adj, rg,
                                           feat_drop=self.feat_drop,
                                           training=training,
                                           bn_moments=moments)
                outs.append(out)
            new_state["layers"].append(ns)
            feats = [jnp.concatenate([o, f], axis=-1)    # dense concat growth
                     for o, f in zip(outs, feats)]
        ro_moments = L.bn_batch_moments(
            [(f, b.node_mask) for f, b in zip(feats, parts)]) \
            if bn_on else None
        srs = []
        for b, f, rg in zip(parts, feats, rngs):
            sr_g, new_state["readout"] = L.attn_readout_apply(
                cp["readout"], state["readout"], f, b.node_mask,
                b.last_idx, rg, feat_drop=self.feat_drop, training=training,
                bn_moments=ro_moments)
            sr_l = jnp.take_along_axis(
                f, b.last_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            srs.append(jnp.concatenate([sr_l, sr_g], axis=-1))
        sr = srs[0] if len(srs) == 1 else jnp.concatenate(srs, axis=0)
        valid = parts[0].valid if len(parts) == 1 \
            else jnp.concatenate([b.valid for b in parts], axis=0)
        if self.batch_norm:
            # head BN runs on the concatenation directly — a single
            # array again, so the joint-moments machinery isn't needed
            sr, new_state["bn"] = L.batchnorm_apply(cp["bn"], state["bn"],
                                                    sr, valid,
                                                    training=training)
        sr = L.linear(cp["fc_sr"], L.dropout(rngs[0], sr, self.feat_drop,
                                             training))
        return sr, params["embedding"], new_state

    def apply(self, params, state, batch, *, training=False, rng=None):
        sr, table, new_state = self.head(params, state, batch,
                                         training=training, rng=rng)
        imask = scoring.item_mask(self.num_items, self.padded_items)
        log_probs = scoring.log_softmax_scores(sr, table, imask,
                                               compute_dtype=self.cdt)
        return log_probs, new_state
