"""Numerical parity of core ops against torch (CPU) and closed forms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from sessionrec_tpu.ops.gru import gru_cell, gru_scan, masked_mailbox_gru
from sessionrec_tpu.ops.masked import masked_mean, masked_softmax, masked_sum
from sessionrec_tpu.ops import scoring


def _torch_grucell_params(cell):
    return {
        "w_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }


def _torch_gru_params(gru):
    return {
        "w_ih": jnp.asarray(gru.weight_ih_l0.detach().numpy()),
        "w_hh": jnp.asarray(gru.weight_hh_l0.detach().numpy()),
        "b_ih": jnp.asarray(gru.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(gru.bias_hh_l0.detach().numpy()),
    }


def test_gru_cell_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.GRUCell(6, 4)
    x = torch.randn(5, 6)
    h = torch.randn(5, 4)
    want = cell(x, h).detach().numpy()
    got = gru_cell(_torch_grucell_params(cell), jnp.asarray(x.numpy()),
                   jnp.asarray(h.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gru_scan_matches_torch():
    torch.manual_seed(1)
    gru = torch.nn.GRU(3, 3, batch_first=True)
    xs = torch.randn(4, 7, 3)
    _, hn = gru(xs)
    want = hn.squeeze(0).detach().numpy()
    got = gru_scan(_torch_gru_params(gru), jnp.asarray(xs.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_masked_mailbox_gru_matches_variable_length_torch():
    """A padded mailbox run must equal torch GRU over the real prefix —
    this is the EOPA reducer contract (lessr.py:20-27)."""
    torch.manual_seed(2)
    gru = torch.nn.GRU(3, 3, batch_first=True)
    p = _torch_gru_params(gru)
    D = 6
    for real_len in [0, 1, 3, 6]:
        mail = torch.randn(2, D, 3)
        mask = np.zeros((2, D), np.float32)
        mask[:, :real_len] = 1
        got = masked_mailbox_gru(p, jnp.asarray(mail.numpy()),
                                 jnp.asarray(mask))
        if real_len == 0:
            np.testing.assert_allclose(np.asarray(got), 0.0)
        else:
            _, hn = gru(mail[:, :real_len])
            np.testing.assert_allclose(np.asarray(got),
                                       hn.squeeze(0).detach().numpy(),
                                       atol=1e-5)


def test_masked_softmax():
    e = jnp.asarray([[1.0, 2.0, 3.0, 9.9]])
    m = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    got = masked_softmax(e, m, axis=1)
    want = np.exp([1, 2, 3]) / np.exp([1, 2, 3]).sum()
    np.testing.assert_allclose(np.asarray(got)[0, :3], want, rtol=1e-6)
    assert got[0, 3] == 0
    # all-masked row -> zeros, no NaN
    got = masked_softmax(e, jnp.zeros_like(m), axis=1)
    np.testing.assert_allclose(np.asarray(got), 0.0)


def test_masked_mean_sum():
    x = jnp.asarray([[1.0, 2.0, 100.0]])[..., None]
    m = jnp.asarray([[1.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(masked_sum(x, m[..., None], 1)), [[3.0]])
    np.testing.assert_allclose(
        np.asarray(masked_mean(x, m[..., None], 1)), [[1.5]])


def test_log_softmax_scores_masks_padding():
    sr = jnp.ones((2, 4))
    table = jnp.ones((8, 4))
    imask = scoring.item_mask(5, 8)
    lp = scoring.log_softmax_scores(sr, table, imask)
    # uniform over 5 real items
    np.testing.assert_allclose(np.asarray(lp[:, :5]), np.log(1 / 5), rtol=1e-6)
    assert float(lp[0, 5]) < -1e20
    # probabilities sum to 1 over real items
    np.testing.assert_allclose(np.exp(np.asarray(lp[:, :5])).sum(-1), 1.0,
                               rtol=1e-6)


def test_topk_ranks_matches_torch_eval():
    """topk_ranks reproduces evaluate()'s rank extraction (train.py:49-53)."""
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 50)).astype(np.float32)
    labels = rng.integers(0, 50, size=16).astype(np.int32)
    ranks = np.asarray(scoring.topk_ranks(jnp.asarray(logits),
                                          jnp.asarray(labels), 20))
    topk = torch.topk(torch.from_numpy(logits), k=20)[1].numpy()
    for i in range(16):
        pos = np.where(topk[i] == labels[i])[0]
        want = pos[0] + 1 if len(pos) else 0
        assert ranks[i] == want


def test_label_ranks_by_count_matches_topk_with_ties():
    """Counting ranks == lax.top_k ranks on tie-heavy inputs.

    Quantised scores force many exact ties, exercising the stable tie
    rule (equal values -> ascending index) that both lax.top_k and
    torch.topk implement; the counting form must reproduce it exactly
    (eval parity with the reference's evaluate(), train.py:45-53)."""
    rng = np.random.default_rng(1)
    for k in (1, 5, 20):
        scores = np.round(rng.normal(size=(32, 64)) * 3) / 3
        scores = scores.astype(np.float32)
        labels = rng.integers(0, 64, size=32).astype(np.int32)
        want = np.asarray(scoring.topk_ranks(jnp.asarray(scores),
                                             jnp.asarray(labels), k))
        got = np.asarray(scoring.label_ranks_by_count(jnp.asarray(scores),
                                                      jnp.asarray(labels), k))
        np.testing.assert_array_equal(got, want)
    # torch.topk cross-check on tie-free data (torch's tie order is not
    # guaranteed stable, but exact float ties are measure-zero in real
    # logits; the reference protocol never hits one)
    scores = rng.normal(size=(32, 64)).astype(np.float32)
    labels = rng.integers(0, 64, size=32).astype(np.int32)
    got = np.asarray(scoring.label_ranks_by_count(jnp.asarray(scores),
                                                  jnp.asarray(labels), 20))
    topk = torch.topk(torch.from_numpy(scores), k=20)[1].numpy()
    for i in range(32):
        pos = np.where(topk[i] == labels[i])[0]
        assert got[i] == (pos[0] + 1 if len(pos) else 0)


def test_label_ranks_by_count_padded_catalog():
    """Padded NEG_INF columns never outrank a real label."""
    lp = np.full((3, 8), -1e30, np.float32)
    lp[:, :5] = np.asarray([[0.1, 0.5, 0.2, 0.4, 0.3]] * 3, np.float32)
    labels = np.asarray([1, 4, 0], np.int32)
    got = np.asarray(scoring.label_ranks_by_count(jnp.asarray(lp),
                                                  jnp.asarray(labels), 3))
    np.testing.assert_array_equal(got, [1, 3, 0])  # rank 5 > k -> 0


def test_nll_loss_ignores_padded_rows():
    lp = jnp.log(jnp.full((4, 10), 0.1))
    labels = jnp.asarray([0, 1, 2, 3])
    valid = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    loss = scoring.nll_loss(lp, labels, valid)
    np.testing.assert_allclose(float(loss), -np.log(0.1), rtol=1e-6)


def test_use_count_ranks_validates_method():
    """One predicate for both single-chip and mesh eval paths; typos must
    fail loudly instead of silently resolving differently per path."""
    from sessionrec_tpu.ops.scoring import use_count_ranks
    assert use_count_ranks(None) and use_count_ranks("count")
    assert not use_count_ranks("topk")
    with pytest.raises(ValueError, match="rank_method"):
        use_count_ranks("cout")
