"""Checkpoint/resume determinism and the training-loop NaN abort.

Kill-and-resume must reproduce the uninterrupted run exactly: the
checkpoint carries params, model state, optimizer state, the dropout PRNG
stream (step_key), loop counters, and early-stop bookkeeping, and the
shuffle order of epoch k is a pure function of (seed, k).

The NaN abort is parity with the reference's per-batch assert
(/root/reference/src/utils/train.py:98), surfaced at log intervals and
epoch ends where losses hit the host anyway.
"""

import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SAMPLE_DIR = str(pathlib.Path(__file__).resolve().parent.parent
                 / "datasets" / "sample")

pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLE_DIR),
                                reason="sample dataset not present")


def _make_runner(ckpt_dir=None, shuffle=True, table_dtype="float32"):
    from sessionrec_tpu.data.io import read_dataset
    from sessionrec_tpu.data.loader import BatchLoader
    from sessionrec_tpu.models import build_model
    from sessionrec_tpu.train.runner import TrainRunner
    from sessionrec_tpu.utils.checkpoint import Checkpointer
    from sessionrec_tpu.utils.config import preset

    cfg = preset("niser", embedding_dim=16, num_layers=1)
    cfg.model.table_dtype = table_dtype
    train_sessions, test_sessions, num_items = read_dataset(SAMPLE_DIR)
    tl = BatchLoader(train_sessions[:400], "session", 128, 20,
                     shuffle=shuffle, seed=7)
    el = BatchLoader(test_sessions[:200], "session", 128, 20)
    model = build_model(cfg.model, num_items)
    ckpt = Checkpointer(ckpt_dir) if ckpt_dir else None
    return TrainRunner(model, tl, el, lr=1e-3, weight_decay=1e-4,
                       patience=10, eval_before_train=False, seed=3,
                       checkpointer=ckpt, unroll=2)


def _flat(params):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(params)])


@pytest.mark.slow
@pytest.mark.parametrize("table_dtype", ["float32", "bfloat16"])
def test_resume_reproduces_uninterrupted_run(tmp_path, table_dtype):
    # bfloat16: the stochastic-rounding seed folds out of the step PRNG
    # key, so a resumed run must replay the exact rounding decisions
    r_full = _make_runner(tmp_path / "full", table_dtype=table_dtype)
    mrr_full, hit_full = r_full.train(4, log_interval=10 ** 9)

    # interrupted: 2 epochs, new process (fresh runner), resume, 2 more
    r_a = _make_runner(tmp_path / "ab", table_dtype=table_dtype)
    r_a.train(2, log_interval=10 ** 9)
    r_b = _make_runner(tmp_path / "ab", table_dtype=table_dtype)
    assert r_b.checkpointer.restore_latest(r_b)
    assert r_b.epoch == 2
    mrr_b, hit_b = r_b.train(4, log_interval=10 ** 9)

    np.testing.assert_allclose(_flat(r_b.params), _flat(r_full.params),
                               rtol=0, atol=0)
    assert np.array_equal(np.asarray(r_b.step_key),
                          np.asarray(r_full.step_key))
    assert (mrr_b, hit_b) == (mrr_full, hit_full)
    assert (r_b.max_mrr, r_b.max_hit, r_b.bad_counter) == \
        (r_full.max_mrr, r_full.max_hit, r_full.bad_counter)


def test_checkpoint_every_epochs(tmp_path):
    r = _make_runner(tmp_path / "every")
    r.checkpoint_every = 2
    r.train(4, log_interval=10 ** 9)
    saved = sorted(p.name for p in (tmp_path / "every").glob("epoch_*.json"))
    assert saved == ["epoch_0001.json", "epoch_0003.json"]


def test_restore_migrates_catalog_padding(tmp_path):
    """VERDICT r3 item 6: a checkpoint written under the old 128-multiple
    ``pad_catalog`` must restore into today's 512-padded layout — the
    embedding table and its Adam-moment rows are pad-migrated, everything
    else restores exactly, and training can continue."""
    import orbax.checkpoint as ocp

    r_a = _make_runner(tmp_path / "mig")
    r_a.train(1, log_interval=10 ** 9)          # writes epoch_0000

    emb = np.asarray(r_a.params["embedding"])
    P_new = emb.shape[0]
    P_old = ((r_a.model.num_items + 127) // 128) * 128   # 128-padded era
    assert P_old < P_new, "sample catalog must distinguish 128 vs 512 pads"

    def shrink(path, leaf):
        keys = [getattr(e, "name", getattr(e, "key", "")) for e in path]
        x = np.asarray(leaf)
        if "embedding" in keys and x.ndim >= 2 and x.shape[0] == P_new:
            return x[:P_old]
        return x

    old_tree = {
        "params": jax.tree_util.tree_map_with_path(shrink, r_a.params),
        "state": r_a.state,
        "opt_state": jax.tree_util.tree_map_with_path(shrink,
                                                      r_a.opt_state),
        "step_key": r_a.step_key,
    }
    ocp.PyTreeCheckpointer().save(tmp_path / "mig" / "epoch_0000",
                                  old_tree, force=True)

    r_b = _make_runner(tmp_path / "mig")
    assert r_b.checkpointer.restore_latest(r_b)
    emb_b = np.asarray(r_b.params["embedding"])
    assert emb_b.shape[0] == P_new
    np.testing.assert_array_equal(emb_b[:P_old], emb[:P_old])
    mus = [np.asarray(x) for p, x in
           jax.tree_util.tree_leaves_with_path(r_b.opt_state)
           if "embedding" in [getattr(e, "name", getattr(e, "key", ""))
                              for e in p] and np.ndim(x) >= 2]
    assert mus and all(m.shape[0] == P_new for m in mus)
    r_b.train(2, log_interval=10 ** 9)           # continues without error


def test_restore_rejects_incompatible_shapes(tmp_path):
    """Non-catalog shape drift must fail with a clear message, not an
    opaque orbax error."""
    import orbax.checkpoint as ocp

    r_a = _make_runner(tmp_path / "bad")
    r_a.train(1, log_interval=10 ** 9)

    def corrupt(path, leaf):
        x = np.asarray(leaf)
        keys = [getattr(e, "name", getattr(e, "key", "")) for e in path]
        if "fc_sr" in keys and x.ndim == 2:      # wrong hidden width
            return x[:, :-1]
        return x

    bad_tree = {
        "params": jax.tree_util.tree_map_with_path(corrupt, r_a.params),
        "state": r_a.state, "opt_state": r_a.opt_state,
        "step_key": r_a.step_key,
    }
    ocp.PyTreeCheckpointer().save(tmp_path / "bad" / "epoch_0000",
                                  bad_tree, force=True)
    r_b = _make_runner(tmp_path / "bad")
    with pytest.raises(ValueError, match="incompatible"):
        r_b.checkpointer.restore_latest(r_b)


def test_nan_abort():
    r = _make_runner(None)
    real_step = r.train_step

    def poisoned(params, state, opt_state, batches, rngs):
        params, state, opt_state, losses = real_step(params, state,
                                                     opt_state, batches, rngs)
        return params, state, opt_state, losses * jnp.nan

    r.train_step = poisoned
    with pytest.raises(FloatingPointError, match="non-finite"):
        r.train(1, log_interval=10 ** 9)
