"""Default-geometry MSGIFSR cross-check (VERDICT r3 item 4c).

The anchor table's MSGIFSR row uses a scaled geometry (dim 32 / order 2 /
B=128) because the reference default (dim 256, order 3,
main_msgifsr.py:39-111) measures ~30 s/step in torch on this container's
2 CPU cores.  This probe closes the geometry gap without the full-run
cost: train BOTH stacks at the exact shipped default geometry (dim 256,
1 layer, order 3, REnorm + fusion, batch 128) on a ~2k-session subset of
the sample dataset for a few epochs, one seed, and compare the
epoch-by-epoch eval curves.  Divergent math (inits, GAT/expander/REnorm
wiring, optimizer) shows up in the first epochs at any scale; only
final-metric noise needs the full budget, and that is what the scaled
anchor row already covers.

Usage:
  python scripts/run_paper_probe.py [--epochs 3] [--train 2048]
      [--test 1024] [--seed 123] [--skip-torch] [--skip-jax]
Writes the subset under results/probe_subset/, per-epoch logs under
results/logs/paper_probe_{torch,jax}.log, and a JSON summary line to
results/paper_probe.jsonl.
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
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

GEOM = dict(dim=256, layers=1, drop=0.1, order=3, extra=True, fusion=True,
            bs=128, shuffle=False, patience=10 ** 9)   # no early stop


def make_subset(n_train, n_test):
    from sessionrec_tpu.data.io import read_dataset
    src = REPO / "datasets" / "sample"
    dst = REPO / "results" / "probe_subset"
    dst.mkdir(parents=True, exist_ok=True)
    train, test, num_items = read_dataset(src)
    for name, sess in (("train.txt", train[:n_train]),
                       ("test.txt", test[:n_test])):
        with open(dst / name, "w") as f:
            for s in sess:
                f.write(",".join(map(str, s)) + "\n")
    (dst / "num_items.txt").write_text(f"{num_items}\n")
    return dst


def run_torch(subset, seed, epochs, log_path):
    """Reference-protocol torch training at the default geometry,
    reusing run_torch_anchor's loop."""
    import run_torch_anchor as A
    cfg = dict(model="msgifsr", **GEOM)
    t0 = time.time()
    with open(log_path, "w") as lf:
        stdout, sys.stdout = sys.stdout, lf
        try:
            rec = A.run_one(cfg, seed, str(subset), epochs)
        finally:
            sys.stdout = stdout
    rec["wall_s"] = round(time.time() - t0, 1)
    return rec, parse_curve(log_path.read_text())


def run_jax(subset, seed, epochs, log_path):
    cmd = [sys.executable, "-m", "sessionrec_tpu.cli", "train",
           "--model", "msgifsr", "--dataset-dir", str(subset),
           "--epochs", str(epochs), "--seed", str(seed),
           "--order", "3", "--extra", "--fusion",
           "--embedding-dim", "256", "--num-layers", "1",
           "--batch-size", "128", "--patience", "1000000"]
    t0 = time.time()
    with open(log_path, "w") as lf:
        proc = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                              cwd=REPO, timeout=4 * 3600)
    if proc.returncode != 0:
        raise RuntimeError(
            f"jax probe run failed rc={proc.returncode}; see {log_path} "
            f"(tail: {log_path.read_text()[-500:]})")
    return {"wall_s": round(time.time() - t0, 1)}, \
        parse_curve(log_path.read_text())


def parse_curve(text):
    """Per-epoch [(mrr, hr)] from either stack's log lines."""
    curve = []
    for m in re.finditer(
            r"epoch (\d+): MRR =? ?([\d.]+)%?,? Hit = ([\d.]+)%|"
            r"epoch (\d+): MRR ([\d.]+) HR ([\d.]+)", text):
        if m.group(1) is not None:
            curve.append((float(m.group(2)), float(m.group(3))))
        else:
            curve.append((100 * float(m.group(5)), 100 * float(m.group(6))))
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--train", type=int, default=2048)
    ap.add_argument("--test", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()

    subset = make_subset(args.train, args.test)
    logs = REPO / "results" / "logs"
    logs.mkdir(parents=True, exist_ok=True)
    out = {"geom": GEOM, "seed": args.seed, "epochs": args.epochs,
           "train_sessions": args.train, "test_sessions": args.test}

    if not args.skip_jax:
        rec, curve = run_jax(subset, args.seed, args.epochs,
                             logs / "paper_probe_jax.log")
        out["jax"] = {"curve": curve, **rec}
        print("jax curve:", curve, flush=True)
    if not args.skip_torch:
        rec, curve = run_torch(subset, args.seed, args.epochs,
                               logs / "paper_probe_torch.log")
        out["torch"] = {"curve": curve, **rec}
        print("torch curve:", curve, flush=True)

    with open(REPO / "results" / "paper_probe.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")
    if "jax" in out and "torch" in out:
        for i, (j, t) in enumerate(zip(out["jax"]["curve"],
                                       out["torch"]["curve"])):
            print(f"epoch {i}: jax MRR {j[0]:.2f} HR {j[1]:.2f} | "
                  f"torch MRR {t[0]:.2f} HR {t[1]:.2f} | "
                  f"dMRR {j[0] - t[0]:+.2f} dHR {j[1] - t[1]:+.2f}")


if __name__ == "__main__":
    main()
