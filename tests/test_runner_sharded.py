"""TrainRunner on a (data, model) mesh — the CLI's --data-parallel /
--model-parallel path — on the virtual 8-device CPU mesh (conftest).

Checks: the mesh runner's metrics match the single-device runner's
(same math, GSPMD only changes placement), the embedding table is
actually row-sharded, and the metrics JSONL sink records events.
"""

import json
import os
import pathlib

import numpy as np
import pytest

import jax

SAMPLE_DIR = str(pathlib.Path(__file__).resolve().parent.parent
                 / "datasets" / "sample")

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8 or not os.path.isdir(SAMPLE_DIR),
    reason="needs 8 devices + sample dataset")


def _loaders(n_train=800, n_test=256, batch_size=64):
    from sessionrec_tpu.data.io import read_dataset
    from sessionrec_tpu.data.loader import BatchLoader
    train_sessions, test_sessions, num_items = read_dataset(SAMPLE_DIR)
    tl = BatchLoader(train_sessions[:n_train], "session", batch_size, 20,
                     shuffle=False)
    el = BatchLoader(test_sessions[:n_test], "session", batch_size, 20)
    return tl, el, num_items


def _runner(mesh, metrics=None):
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.train.runner import TrainRunner
    tl, el, num_items = _loaders()
    model = NISER(num_items=num_items, embedding_dim=32, num_layers=1,
                  feat_drop=0.0)
    return TrainRunner(model, tl, el, lr=1e-3, weight_decay=1e-4,
                       patience=10, eval_before_train=False, unroll=4,
                       mesh=mesh, metrics=metrics, seed=7)


@pytest.mark.slow
def test_mesh_runner_matches_single_device(tmp_path):
    from sessionrec_tpu.parallel.mesh import MODEL_AXIS, make_mesh
    from sessionrec_tpu.utils.metrics import MetricsLogger

    single = _runner(mesh=None)
    mrr1, hit1 = single.train(1, log_interval=10 ** 9)

    mesh = make_mesh(data=4, model=2)
    metrics_path = tmp_path / "metrics.jsonl"
    sharded = _runner(mesh, metrics=MetricsLogger(metrics_path))
    mrr2, hit2 = sharded.train(1, log_interval=10 ** 9)

    # identical data order + seeds -> metrics agree to float tolerance
    assert hit2 == pytest.approx(hit1, abs=2e-2), (hit1, hit2)
    assert mrr2 == pytest.approx(mrr1, abs=2e-2), (mrr1, mrr2)

    # table is genuinely row-sharded over the model axis
    emb = sharded.params["embedding"]
    assert MODEL_AXIS in str(emb.sharding.spec), emb.sharding

    # metrics sink recorded the eval event
    events = [json.loads(l) for l in
              metrics_path.read_text().strip().splitlines()]
    kinds = {e["kind"] for e in events}
    assert "eval" in kinds, events
    ev = [e for e in events if e["kind"] == "eval"][-1]
    assert ev["mrr"] == pytest.approx(mrr2, abs=1e-6)


def test_run_training_builds_mesh(tmp_path):
    """CLI-level path: run_training with data_parallel*model_parallel>1."""
    from sessionrec_tpu.utils.config import preset
    from sessionrec_tpu.train.session import run_training

    cfg = preset("niser", embedding_dim=32, num_layers=1,
                 dataset_dir=SAMPLE_DIR, batch_size=64, epochs=1,
                 data_parallel=4, model_parallel=2, unroll=2,
                 eval_before_train=False,
                 metrics_file=str(tmp_path / "m.jsonl"))
    mrr, hit = run_training(cfg, max_epoch_batches=6)
    assert np.isfinite(mrr) and np.isfinite(hit)
    assert (tmp_path / "m.jsonl").exists()


def test_mesh_runner_bf16_table():
    """bf16 table + stochastic-rounded updates under the (data, model)
    mesh: the ZeRO-sharded Adam moments and the SR update path must
    compose with GSPMD (the SR hash is elementwise, so it partitions).
    Metrics must stay finite and the table must stay bf16 + row-sharded."""
    import jax.numpy as jnp
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.parallel.mesh import make_mesh
    from sessionrec_tpu.train.runner import TrainRunner

    tl, el, num_items = _loaders()
    model = NISER(num_items=num_items, embedding_dim=32, num_layers=1,
                  feat_drop=0.0, table_dtype="bfloat16")
    runner = TrainRunner(model, tl, el, lr=1e-3, weight_decay=1e-4,
                         patience=10, eval_before_train=False, unroll=4,
                         mesh=make_mesh(data=4, model=2), seed=7)
    mrr, hit = runner.train(1, log_interval=10 ** 9)
    assert np.isfinite([mrr, hit]).all()
    assert hit > 0
    emb = runner.params["embedding"]
    assert emb.dtype == jnp.bfloat16
    # still row-sharded over the model axis
    assert emb.sharding.shard_shape(emb.shape)[0] == emb.shape[0] // 2
