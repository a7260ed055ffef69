"""Full-model value+grad parity: each JAX model vs its plain-torch
replica (tests/torch_ref_models.py), composed end-to-end — embedding ->
layers -> readout -> log-probs -> nll loss (VERDICT r2 missing item 2:
layer-level parity alone cannot catch integration bugs between layers).

Dropout is off (masks are backend-random); BatchNorm runs in training
mode so batch statistics (masked to real rows) are exercised.  Compared:
log-probs on valid examples over the real catalog, the nll loss, and
gradients of the embedding table + deepest/shallowest layer params.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from sessionrec_tpu.graph import builders
from sessionrec_tpu.graph.batch import (CcsBatch, CcsLevel, LessrBatch,
                                        SessionGraphBatch)
from sessionrec_tpu.models import LESSR, MSGIFSR, NISER, SRGNN
from sessionrec_tpu.ops import scoring

from test_layer_torch_parity import bn_p, gru_p, grucell_p, lin_p, t2j
from torch_ref_models import (TorchLESSR, TorchMSGIFSR, TorchNISER,
                              TorchSRGNN)

ATOL = 5e-5
NUM_ITEMS = 60
MAX_LEN = 8
B = 6


def _seqs(rng, n=B - 1):
    # n real examples (the last row stays padding: valid=0)
    lens = rng.integers(1, MAX_LEN, size=n)
    seqs = [list(rng.integers(0, NUM_ITEMS, size=l)) for l in lens]
    labels = list(rng.integers(0, NUM_ITEMS, size=n))
    return seqs, labels


def _prelu_p(act):
    return {"a": t2j(act.weight)}


def _pad_table(w, padded):
    w = t2j(w)
    return jnp.concatenate(
        [w, jnp.zeros((padded - w.shape[0], w.shape[1]), w.dtype)], 0)


def _gat_p(conv):
    return {"fc": t2j(conv.fc.weight), "attn_l": t2j(conv.attn_l),
            "attn_r": t2j(conv.attn_r), "bias": t2j(conv.bias)}


def _readout_p(ro):
    p = {"fc_u": lin_p(ro.fc_u), "fc_v": lin_p(ro.fc_v),
         "fc_e": lin_p(ro.fc_e)}
    s = {}
    if ro.fc_out is not None:
        p["fc_out"] = lin_p(ro.fc_out)
    if ro.batch_norm is not None:
        p["bn"], s["bn"] = bn_p(ro.batch_norm)
    if ro.activation is not None:
        p["act"] = _prelu_p(ro.activation)
    return p, s


def _compare(jmodel, jparams, jstate, batch, tmodel, tbatch_labels,
             grad_leaves):
    """Run both sides, compare log-probs + loss values and grads."""
    labels, valid = tbatch_labels
    # ---- torch side
    tmodel.train()
    logp_t = tmodel(batch)
    v = torch.from_numpy(valid.astype(bool))
    loss_t = torch.nn.functional.nll_loss(
        logp_t[v], torch.from_numpy(labels[valid.astype(bool)]).long())
    loss_t.backward()

    # ---- jax side
    def f(p):
        lp, _ = jmodel.apply(p, jstate, batch, training=True, rng=None)
        return scoring.nll_loss(lp, batch.labels, batch.valid), lp

    (loss_j, logp_j), grads = jax.value_and_grad(f, has_aux=True)(jparams)

    vb = valid.astype(bool)
    np.testing.assert_allclose(
        np.asarray(logp_j)[vb][:, :NUM_ITEMS],
        logp_t.detach().numpy()[vb], atol=ATOL)
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=ATOL)
    for name, got, want in grad_leaves(grads):
        if want is None:
            # torch: parameter unreachable from the loss (e.g. the GNN
            # stack of SRGNN/NISER — the readout-on-embedding quirk,
            # srgnn.py:141-142, leaves the GNN output unused); the JAX
            # grad must be exactly zero
            assert float(jnp.max(jnp.abs(got))) == 0.0, name
        else:
            np.testing.assert_allclose(np.asarray(got),
                                       want.detach().numpy(),
                                       atol=ATOL, err_msg=name)


def test_srgnn_model_matches_torch():
    torch.manual_seed(0)
    rng = np.random.default_rng(1)
    seqs, labels = _seqs(rng)
    d = builders.build_session_batch(seqs, labels, MAX_LEN, B)
    batch = SessionGraphBatch(**d)

    tm = TorchSRGNN(NUM_ITEMS, 16, 2, feat_drop=0.0)
    jm = SRGNN(num_items=NUM_ITEMS, embedding_dim=16, num_layers=2)
    jp = {
        "embedding": _pad_table(tm.embedding.weight, jm.padded_items),
        "layers": [{"gru": grucell_p(l.gru), "W1": lin_p(l.W1),
                    "W2": lin_p(l.W2)} for l in tm.layers],
        "fc_sr": lin_p(tm.fc_sr),
        "readout": _readout_p(tm.readout)[0],
    }

    def leaves(g):
        return [
            ("embedding", g["embedding"][:NUM_ITEMS],
             tm.embedding.weight.grad),
            ("layers.0.W1", g["layers"][0]["W1"]["w"],
             tm.layers[0].W1.weight.grad),
            ("readout.fc_e", g["readout"]["fc_e"]["w"],
             tm.readout.fc_e.weight.grad),
            ("fc_sr", g["fc_sr"]["w"], tm.fc_sr.weight.grad),
        ]

    _compare(jm, jp, {}, batch, tm, (d["labels"], d["valid"]), leaves)


def test_niser_model_matches_torch():
    torch.manual_seed(1)
    rng = np.random.default_rng(2)
    seqs, labels = _seqs(rng)
    d = builders.build_session_batch(seqs, labels, MAX_LEN, B)
    batch = SessionGraphBatch(**d)

    tm = TorchNISER(NUM_ITEMS, 16, 2, feat_drop=0.0)
    jm = NISER(num_items=NUM_ITEMS, embedding_dim=16, num_layers=2)
    jp = {
        "embedding": _pad_table(tm.embedding.weight, jm.padded_items),
        "layers": [{"gru": grucell_p(l.gru), "W1": lin_p(l.W1),
                    "W2": lin_p(l.W2)} for l in tm.layers],
        "fc_sr": lin_p(tm.fc_sr),
        "readout": _readout_p(tm.readout)[0],
    }

    def leaves(g):
        return [
            ("embedding", g["embedding"][:NUM_ITEMS],
             tm.embedding.weight.grad),
            ("layers.1.W2", g["layers"][1]["W2"]["w"],
             tm.layers[1].W2.weight.grad),
            ("readout.fc_u", g["readout"]["fc_u"]["w"],
             tm.readout.fc_u.weight.grad),
        ]

    _compare(jm, jp, {}, batch, tm, (d["labels"], d["valid"]), leaves)


@pytest.mark.slow
def test_lessr_model_matches_torch():
    torch.manual_seed(2)
    rng = np.random.default_rng(3)
    seqs, labels = _seqs(rng)
    d = builders.build_lessr_batch(seqs, labels, MAX_LEN, B)
    batch = LessrBatch(**d)

    tm = TorchLESSR(NUM_ITEMS, 16, 3, feat_drop=0.0, batch_norm=True)
    jm = LESSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=3)
    layers_p, layers_s = [], []
    for i, l in enumerate(tm.layers):
        if i % 2 == 0:
            p = {"gru": grucell_p(l.gru_cell), "fc_self": lin_p(l.fc_self),
                 "fc_neigh": lin_p(l.fc_neigh),
                 "act": _prelu_p(l.activation)}
        else:
            p = {"fc_q": lin_p(l.fc_q), "fc_k": lin_p(l.fc_k),
                 "fc_v": lin_p(l.fc_v), "fc_e": lin_p(l.fc_e),
                 "act": _prelu_p(l.activation)}
        s = {}
        p["bn"], s["bn"] = bn_p(l.batch_norm)
        layers_p.append(p)
        layers_s.append(s)
    ro_p, ro_s = _readout_p(tm.readout)
    bn_head_p, bn_head_s = bn_p(tm.batch_norm)
    jp = {
        # max_norm table: the JAX invariant expects projected params; a
        # fresh torch table is N(0,1) so rows exceed norm 1 — project the
        # torch weights THROUGH a lookup first so both sides score the
        # renormed table
        "embedding": None,  # filled below
        "layers": layers_p,
        "readout": ro_p,
        "bn": bn_head_p,
        "fc_sr": lin_p(tm.fc_sr),
    }
    with torch.no_grad():
        # trigger torch's in-place max_norm renorm of every row, so the
        # stored table equals the projected table the JAX side carries
        tm.embedding(tm.indices)
    jp["embedding"] = _pad_table(tm.embedding.weight, jm.padded_items)
    js = {"layers": layers_s, "readout": ro_s, "bn": bn_head_s}

    def leaves(g):
        return [
            ("embedding", g["embedding"][:NUM_ITEMS],
             tm.embedding.weight.grad),
            ("layers.0.fc_neigh", g["layers"][0]["fc_neigh"]["w"],
             tm.layers[0].fc_neigh.weight.grad),
            ("layers.1.fc_q", g["layers"][1]["fc_q"]["w"],
             tm.layers[1].fc_q.weight.grad),
            ("fc_sr", g["fc_sr"]["w"], tm.fc_sr.weight.grad),
        ]

    _compare(jm, jp, js, batch, tm, (d["labels"], d["valid"]), leaves)


@pytest.mark.parametrize("order,extra,fusion", [
    (1, False, False),
    pytest.param(3, True, True, marks=pytest.mark.slow)])
def test_msgifsr_model_matches_torch(order, extra, fusion):
    torch.manual_seed(3)
    rng = np.random.default_rng(4)
    seqs, labels = _seqs(rng)
    d = builders.build_ccs_batch(seqs, labels, order, MAX_LEN, B)
    batch = CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                     inter_in=tuple(d["inter_in"]),
                     inter_out=tuple(d["inter_out"]),
                     labels=d["labels"], valid=d["valid"])

    tm = TorchMSGIFSR(NUM_ITEMS, 16, 1, feat_drop=0.0, order=order,
                      extra=extra, fusion=fusion)
    jm = MSGIFSR(num_items=NUM_ITEMS, embedding_dim=16, num_layers=1,
                 order=order, extra=extra, fusion=fusion)
    with torch.no_grad():
        tm.embedding(tm.indices)   # in-place max_norm projection (see LESSR)
    layers_p = []
    for l in tm.layers:
        lp = {"conv1": {}, "conv2": {}}
        for cname, conv in (("conv1", l.conv1), ("conv2", l.conv2)):
            for rel, mod in conv.items():
                lp[cname][rel] = _gat_p(mod)
        layers_p.append(lp)
    jp = {
        "embedding": _pad_table(tm.embedding.weight, jm.padded_items),
        "alpha": t2j(tm.alpha), "beta": t2j(tm.beta),
        "expander": {"grus": [gru_p(g) for g in tm.expander.grus],
                     "Ws": []},
        "layers": layers_p,
        "readout": {"fc_u": [lin_p(m) for m in tm.fc_u],
                    "fc_v": [lin_p(m) for m in tm.fc_v],
                    "fc_e": [lin_p(m) for m in tm.fc_e]},
        "fc_sr": [lin_p(m) for m in tm.fc_sr],
        "sc_sr": [{"l1": lin_p(m[0]), "l2": lin_p(m[2])}
                  for m in tm.sc_sr],
    }

    def leaves(g):
        out = [
            ("embedding", g["embedding"][:NUM_ITEMS],
             tm.embedding.weight.grad),
            ("conv1.intra1.fc", g["layers"][0]["conv1"]["intra1"]["fc"],
             tm.layers[0].conv1["intra1"].fc.weight.grad),
            ("conv2.intra1.attn_l",
             g["layers"][0]["conv2"]["intra1"]["attn_l"],
             tm.layers[0].conv2["intra1"].attn_l.grad),
            ("fc_sr.0", g["fc_sr"][0]["w"], tm.fc_sr[0].weight.grad),
        ]
        if order > 1:
            out.append(("conv1.inter.fc",
                        g["layers"][0]["conv1"]["inter"]["fc"],
                        tm.layers[0].conv1["inter"].fc.weight.grad))
            out.append(("expander.gru0.w_ih",
                        g["expander"]["grus"][0]["w_ih"],
                        tm.expander.grus[0].weight_ih_l0.grad))
            if fusion:
                out.append(("alpha", g["alpha"], tm.alpha.grad))
        if extra:
            out.append(("sc_sr.0.l1", g["sc_sr"][0]["l1"]["w"],
                        tm.sc_sr[0][0].weight.grad))
        return out

    _compare(jm, jp, {}, batch, tm, (d["labels"], d["valid"]), leaves)
