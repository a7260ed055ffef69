"""Multi-host runtime: a REAL 2-process x 4-CPU-device run (gloo
collectives, jax.distributed) must reproduce the single-process
8-device run's metrics — same global mesh, same global ordered stream,
each host building only its rows of every global batch
(parallel/multihost.py; SURVEY.md §2.3 comm row / §7.3 hard part 5).
"""

import pathlib
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "_mh_worker.py"
SAMPLE = REPO / "datasets" / "sample"

pytestmark = [pytest.mark.slow, pytest.mark.multihost,
              pytest.mark.skipif(not SAMPLE.is_dir(),
                                reason="sample dataset not present")]

# --split-len 0: these tests assert exact metric parity between a
# 1-process and a 2-process run of the SAME math; multi-host input
# slicing auto-disables length bucketing (train/session.py), so the
# single-process side must not bucket either (different dropout draw
# streams would break the exact comparison).
TRAIN_FLAGS = ["--model", "niser", "--dataset-dir", str(SAMPLE),
               "--embedding-dim", "16", "--num-layers", "1",
               "--epochs", "1", "--max-epoch-batches", "6",
               "--batch-size", "64", "--log-interval", "1000000",
               "--unroll", "2", "--split-len", "0"]


def _free_port():
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def _final_metrics(stdout: str):
    m = re.search(r"^([\d.]+)%\t([\d.]+)%\s*$", stdout, re.M)
    assert m, f"no final metrics in output:\n{stdout[-2000:]}"
    return float(m.group(1)), float(m.group(2))


def _run_workers(nproc, ndev, extra, base_flags=None):
    port = str(_free_port())
    base = TRAIN_FLAGS if base_flags is None else base_flags
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), port, str(pid), str(nproc), str(ndev),
         *base, *extra],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=REPO, text=True)
        for pid in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_two_process_matches_single_process(dp, mp):
    extra = ["--data-parallel", str(dp), "--model-parallel", str(mp)]
    single = _run_workers(1, 8, extra)[0]
    multi = _run_workers(2, 4, extra)
    mrr_s, hit_s = _final_metrics(single)
    mrr_m, hit_m = _final_metrics(multi[0])
    # identical global mesh + identical global batches => identical math;
    # tolerance only covers the 3-decimal print rounding
    assert np.isclose(mrr_m, mrr_s, atol=2e-3), (mrr_m, mrr_s)
    assert np.isclose(hit_m, hit_s, atol=2e-3), (hit_m, hit_s)
    # the secondary must agree with the primary (replicated eval)
    mrr_1, hit_1 = _final_metrics(multi[1])
    assert (mrr_1, hit_1) == (mrr_m, hit_m)


# VERDICT r2 item 7: the fused multi-order mesh loss
# (parallel/sharded.py:_fused_multi_mesh_fwd/bwd) under REAL process
# boundaries — its collective merges (psum of per-shard REnorm stats
# over the model axis) are exercised nowhere else multi-process.
MSGIFSR_FLAGS = ["--model", "msgifsr", "--order", "2", "--extra",
                 "--fusion", "--dataset-dir", str(SAMPLE),
                 "--embedding-dim", "16", "--num-layers", "1",
                 "--epochs", "1", "--max-epoch-batches", "4",
                 "--batch-size", "64", "--log-interval", "1000000",
                 "--unroll", "2", "--split-len", "0"]


def test_two_process_msgifsr_renorm_fusion():
    extra = ["--data-parallel", "4", "--model-parallel", "2"]
    single = _run_workers(1, 8, extra, MSGIFSR_FLAGS)[0]
    multi = _run_workers(2, 4, extra, MSGIFSR_FLAGS)
    mrr_s, hit_s = _final_metrics(single)
    mrr_m, hit_m = _final_metrics(multi[0])
    assert np.isclose(mrr_m, mrr_s, atol=2e-3), (mrr_m, mrr_s)
    assert np.isclose(hit_m, hit_s, atol=2e-3), (hit_m, hit_s)
    mrr_1, hit_1 = _final_metrics(multi[1])
    assert (mrr_1, hit_1) == (mrr_m, hit_m)
