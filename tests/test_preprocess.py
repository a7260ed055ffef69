"""Preprocessing pipeline invariants on synthetic raw data."""

import numpy as np
import pandas as pd
import pytest

from sessionrec_tpu.data import preprocess as pp
from sessionrec_tpu.data.io import read_dataset


def _synthetic_gowalla(tmp_path, n_users=30, n_items=40, n_events=2000):
    rng = np.random.default_rng(0)
    t0 = pd.Timestamp("2020-01-01")
    rows = []
    for _ in range(n_events):
        u = rng.integers(0, n_users)
        dt = t0 + pd.Timedelta(minutes=int(rng.integers(0, 60 * 24 * 30)))
        item = int(rng.integers(0, n_items))
        rows.append((f"u{u}", dt.isoformat(), 0.0, 0.0, f"i{item}"))
    df = pd.DataFrame(rows).sort_values([0, 1])
    path = tmp_path / "gowalla.txt"
    df.to_csv(path, sep="\t", header=False, index=False)
    return path


def test_gowalla_pipeline(tmp_path):
    raw = _synthetic_gowalla(tmp_path)
    out = tmp_path / "out"
    pp.preprocess_gowalla(out, raw)
    train, test, num_items = read_dataset(out)
    assert len(train) > 0 and len(test) > 0
    # all sessions have >= 2 items
    assert min(len(s) for s in train + test) >= 2
    # ids dense in [0, num_items)
    all_ids = {i for s in train for i in s}
    assert max(all_ids) < num_items and min(all_ids) >= 0
    assert num_items == len({i for s in train for i in s})
    # test items are a subset of train items
    assert {i for s in test for i in s} <= all_ids
    # sessions truncated to 20
    assert max(len(s) for s in train + test) <= 20


def test_diginetica_pipeline(tmp_path):
    rng = np.random.default_rng(1)
    rows = []
    base = pd.Timestamp("2016-01-01")
    for sid in range(120):
        day = int(rng.integers(0, 60))
        for j in range(int(rng.integers(2, 8))):
            rows.append({
                "sessionId": sid,
                "userId": "NA",
                "itemId": int(rng.integers(0, 30)),
                "timeframe": j * 1000,
                "eventdate": (base + pd.Timedelta(days=day)).date().isoformat(),
            })
    raw = tmp_path / "train-item-views.csv"
    pd.DataFrame(rows)[["sessionId", "userId", "itemId", "timeframe",
                        "eventdate"]].to_csv(raw, sep=";", index=False)
    out = tmp_path / "digi"
    pp.preprocess_diginetica(out, raw)
    train, test, num_items = read_dataset(out)
    assert len(train) > 0
    assert min(len(s) for s in train) >= 2
    assert {i for s in test for i in s} <= {i for s in train for i in s}


def _synthetic_yoochoose(tmp_path, n_sessions=200, long_tail=True):
    rng = np.random.default_rng(2)
    rows = []
    for sid in range(n_sessions):
        day = int(rng.integers(0, 20))
        # include some sessions well past 20 items: stage-1 must NOT
        # truncate them (reference passes sessions through whole)
        n = int(rng.integers(25, 40)) if (long_tail and sid % 17 == 0) \
            else int(rng.integers(2, 6))
        for j in range(n):
            ts = f"2014-04-{day + 1:02d}T10:{j:02d}:00.000Z"
            rows.append(f"{sid},{ts},{int(rng.integers(100, 140))},0")
    raw = tmp_path / "yoochoose-clicks.dat"
    raw.write_text("\n".join(rows) + "\n")
    return raw


def test_yoochoose_stage1(tmp_path):
    raw = _synthetic_yoochoose(tmp_path)
    pp.preprocess_yoochoose_stage1(tmp_path, raw)
    for split in ["yoochoose_full", "yoochoose1_4", "yoochoose1_64"]:
        train, test, num_items = read_dataset(tmp_path / split)
        assert len(train) > 0
        # ids 0-based, dense under num_items (parity with reference's
        # item_ctr=0 renumbering; num_items = max id + 1)
        assert all(0 <= i < num_items for s in train + test for i in s)
    full, _, num_items_full = read_dataset(tmp_path / "yoochoose_full")
    assert min(i for s in full for i in s) == 0
    # sessions are NOT truncated at stage-1 (capping happens at load time)
    assert max(len(s) for s in full) > 20
    quarter, _, _ = read_dataset(tmp_path / "yoochoose1_4")
    assert len(quarter) == len(full) // 4
    # 1/4 slice is the tail (most recent sessions)
    assert quarter == full[-(len(full) // 4):]


REF_STAGE1 = "/root/reference/datasets/preprocess_yoochoose.py"


@pytest.mark.skipif(not __import__("os").path.exists(REF_STAGE1),
                    reason="reference script not available")
def test_yoochoose_stage1_matches_reference_script(tmp_path):
    """Oracle test: run the reference stage-1 script on the same synthetic
    clicks file and require identical session sequences, counts, and item
    numbering in the 1/4 and 1/64 slices."""
    import pickle
    import subprocess
    import sys

    _synthetic_yoochoose(tmp_path)
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    (ref_dir / "yoochoose-clicks.dat").write_text(
        (tmp_path / "yoochoose-clicks.dat").read_text())
    subprocess.run([sys.executable, REF_STAGE1, "--dataset", "yoochoose"],
                   cwd=ref_dir, check=True, capture_output=True)

    ours_dir = tmp_path / "ours"
    pp.preprocess_yoochoose_stage1(
        ours_dir, tmp_path / "yoochoose-clicks.dat")

    for split in ["yoochoose1_4", "yoochoose1_64"]:
        ref_train = pickle.load(open(ref_dir / split / "train_pre.txt", "rb"))[0]
        ref_test = pickle.load(open(ref_dir / split / "test_pre.txt", "rb"))[0]
        train, test, num_items = read_dataset(ours_dir / split)
        assert train == ref_train
        assert test == ref_test
        # our num_items is the true catalog size; the reference's stage-2
        # would write max id (one less with 0-based ids)
        max_id = max(i for s in ref_train + ref_test for i in s)
        assert num_items == max_id + 1
