"""Accuracy-parity sweep: run every model preset to early-stop on a dataset
and record best MRR@20 / HR@20 per seed.

Produces ``results/results.jsonl`` (one JSON object per finished run) and a
per-run stdout log under ``results/logs/``.  ``RESULTS.md`` is rendered from
the JSONL by ``scripts/render_results.py``.

This is the measurement protocol BASELINE.md step 2 calls for: the exact
reference configs (utils/config.py presets == main_{lessr,niser,msgifsr}.py
defaults; ordered train stream per README.md:37) across >=3 seeds, reporting
the running-max metrics the reference's TrainRunner returns
(/root/reference/src/utils/train.py:124-127).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

# (run name, model, extra CLI flags) — presets already carry each reference
# script's defaults; msgifsr is measured at order 1 (start.sh:10's config)
# and order 3 (main_msgifsr.py's default).
CONFIGS = [
    ("srgnn", "srgnn", []),
    ("niser", "niser", []),
    ("lessr", "lessr", []),
    ("msgifsr-o1", "msgifsr", ["--order", "1"]),
    ("msgifsr-o3", "msgifsr", ["--order", "3"]),
    # WSDM'22 headline configuration: REnorm + IFR fusion.
    ("msgifsr-o3-extra-fusion", "msgifsr",
     ["--order", "3", "--extra", "--fusion"]),
    # JAX side of the torch-replica anchor (scripts/run_torch_anchor.py
    # ANCHORS["msgifsr-anchor"]): scaled so the 2-CPU torch side can
    # train it; flags must stay in lock-step with that file.
    ("msgifsr-anchor", "msgifsr",
     ["--order", "2", "--extra", "--fusion", "--embedding-dim", "32",
      "--batch-size", "128"]),
]

SEEDS = [123, 223, 323]


def run_one(name, model, flags, seed, dataset_dir, out_dir, epochs):
    log_path = out_dir / "logs" / f"{name}-seed{seed}.log"
    cmd = [sys.executable, "-m", "sessionrec_tpu.cli", "train",
           "--model", model, "--dataset-dir", dataset_dir,
           "--epochs", str(epochs), "--seed", str(seed), *flags]
    t0 = time.time()
    with open(log_path, "w") as lf:
        proc = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                              cwd=REPO, timeout=4 * 3600)
    dt = time.time() - t0
    text = log_path.read_text()
    rec = {"name": name, "model": model, "flags": flags, "seed": seed,
           "dataset": dataset_dir, "epochs": epochs,
           "wall_s": round(dt, 1), "rc": proc.returncode}
    m = re.search(r"^([\d.]+)%\t([\d.]+)%\s*$", text, re.M)
    if proc.returncode == 0 and m:
        rec["mrr20"] = float(m.group(1))
        rec["hr20"] = float(m.group(2))
    else:
        rec["error"] = text[-2000:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", default="datasets/sample")
    ap.add_argument("--out", default="results")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--only", default=None,
                    help="comma-separated run names to (re)run")
    args = ap.parse_args()

    out_dir = REPO / args.out
    (out_dir / "logs").mkdir(parents=True, exist_ok=True)
    results_path = out_dir / "results.jsonl"
    done = set()
    if results_path.exists():
        for line in results_path.read_text().splitlines():
            r = json.loads(line)
            if "mrr20" in r:
                done.add((r["name"], r["seed"], r["dataset"]))

    only = set(args.only.split(",")) if args.only else None
    for name, model, flags in CONFIGS:
        if only and name not in only:
            continue
        for seed in SEEDS:
            key = (name, seed, args.dataset_dir)
            if key in done:
                print(f"skip {name} seed={seed} (already recorded)", flush=True)
                continue
            print(f"run  {name} seed={seed} ...", flush=True)
            rec = run_one(name, model, flags, seed, args.dataset_dir,
                          out_dir, args.epochs)
            with open(results_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            status = (f"mrr20={rec.get('mrr20')} hr20={rec.get('hr20')}"
                      if "mrr20" in rec else f"FAILED rc={rec['rc']}")
            print(f"done {name} seed={seed}: {status} ({rec['wall_s']}s)",
                  flush=True)


if __name__ == "__main__":
    main()
