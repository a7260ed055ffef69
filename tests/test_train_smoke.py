"""End-to-end training smoke: loss decreases and metrics clear a floor on
a slice of the reference's bundled sample dataset (the de-facto
integration fixture, SURVEY.md §4)."""

import os
import pathlib

import numpy as np
import pytest

SAMPLE_DIR = str(pathlib.Path(__file__).resolve().parent.parent
                 / "datasets" / "sample")

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(SAMPLE_DIR),
                                reason="sample dataset not present")]


def _run(model_name, n_sessions=1200, epochs=2, **model_overrides):
    from sessionrec_tpu.data.io import read_dataset
    from sessionrec_tpu.data.loader import BatchLoader
    from sessionrec_tpu.models import build_model
    from sessionrec_tpu.train.runner import TrainRunner
    from sessionrec_tpu.utils.config import preset

    cfg = preset(model_name, embedding_dim=32, **model_overrides)
    train_sessions, test_sessions, num_items = read_dataset(SAMPLE_DIR)
    train_sessions = train_sessions[:n_sessions]
    test_sessions = test_sessions[:300]
    kind = {"srgnn": "session", "niser": "session", "lessr": "lessr",
            "msgifsr": "ccs"}[model_name]
    tl = BatchLoader(train_sessions, kind, 256, 20,
                     shuffle=cfg.data.shuffle_train, order=cfg.model.order)
    el = BatchLoader(test_sessions, kind, 256, 20, order=cfg.model.order)
    model = build_model(cfg.model, num_items)
    runner = TrainRunner(model, tl, el, lr=1e-3, weight_decay=1e-4,
                         patience=10, eval_before_train=False)
    mrr, hit = runner.train(epochs, log_interval=10 ** 9)
    return mrr, hit


# floors calibrated against the RESULTS.md sweep era (observed
# short-budget values: srgnn 18.9%/6.0%, niser 26.9%/14.7%, lessr
# 10.0%/4.1%, msgifsr 32.2%/23.3%), set at ~70-80% of observed so a
# genuine quality regression fails while seed noise passes; random HR@20
# on 3429 items would be 0.58%.
@pytest.mark.parametrize("name,kw,n_sessions,epochs,hit_floor,mrr_floor", [
    ("srgnn", {}, 10 ** 9, 3, 0.14, 0.04),
    ("niser", {}, 10 ** 9, 3, 0.21, 0.11),
    ("lessr", dict(num_layers=2), 3000, 2, 0.07, 0.028),
    ("msgifsr", dict(order=2, extra=True, fusion=True), 3000, 2, 0.26,
     0.18),
])
def test_convergence_floor(name, kw, n_sessions, epochs, hit_floor,
                           mrr_floor):
    mrr, hit = _run(name, n_sessions=n_sessions, epochs=epochs, **kw)
    assert hit > hit_floor, (name, mrr, hit)
    assert mrr > mrr_floor, (name, mrr, hit)
