"""Render RESULTS.md from results/results.jsonl (scripts/run_results.py)."""

from __future__ import annotations

import json
import pathlib
from collections import defaultdict

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def load(path):
    groups = defaultdict(list)
    for line in path.read_text().splitlines():
        r = json.loads(line)
        if "mrr20" in r:
            groups[(r["name"], r["dataset"])].append(r)
    return groups


def render(groups):
    lines = []
    lines.append("| config | dataset | seeds | MRR@20 | HR@20 | "
                 "wall-clock/run |")
    lines.append("|---|---|---|---|---|---|")
    order = ["srgnn", "niser", "lessr", "msgifsr-o1", "msgifsr-o3",
             "msgifsr-o3-extra-fusion", "msgifsr-anchor"]
    keys = sorted(groups, key=lambda k: (order.index(k[0])
                                         if k[0] in order else 99, k[1]))
    for name, ds in keys:
        rs = groups[(name, ds)]
        mrr = np.array([r["mrr20"] for r in rs])
        hr = np.array([r["hr20"] for r in rs])
        wall = np.array([r["wall_s"] for r in rs])
        ds_short = pathlib.Path(ds).name
        lines.append(
            f"| {name} | {ds_short} | {len(rs)} "
            f"| {mrr.mean():.2f}% ± {mrr.max() - mrr.min():.2f} "
            f"| {hr.mean():.2f}% ± {hr.max() - hr.min():.2f} "
            f"| {np.median(wall):.0f}s |")
    return "\n".join(lines)


def render_anchor(jax_groups, torch_path):
    """JAX-vs-torch-replica table for the anchor configs
    (scripts/run_torch_anchor.py records the torch side)."""
    # keep only the NEWEST row per (name, seed): protocol fixes re-run
    # individual seeds and append (the jsonl is append-only)
    newest = {}
    for line in torch_path.read_text().splitlines():
        r = json.loads(line)
        newest[(r["name"], r["seed"])] = r
    tg = defaultdict(list)
    for (name, _), r in sorted(newest.items()):
        tg[name].append(r)
    jmap = {"srgnn": "srgnn", "niser": "niser", "lessr": "lessr",
            "msgifsr-anchor": "msgifsr-anchor"}
    lines = ["| config | stack | seeds | MRR@20 | HR@20 |",
             "|---|---|---|---|---|"]
    for tname in ("srgnn", "niser", "lessr", "msgifsr-anchor"):
        rows = []
        jrs = [r for (n, _), g in jax_groups.items() if n == jmap[tname]
               for r in g]
        if jrs:
            rows.append(("jax (this framework)", jrs))
        if tg.get(tname):
            rows.append(("torch replica (reference protocol)", tg[tname]))
        for stack, rs in rows:
            mrr = np.array([r["mrr20"] for r in rs])
            hr = np.array([r["hr20"] for r in rs])
            lines.append(
                f"| {tname} | {stack} | {len(rs)} "
                f"| {mrr.mean():.2f}% ± {mrr.max() - mrr.min():.2f} "
                f"| {hr.mean():.2f}% ± {hr.max() - hr.min():.2f} |")
    return "\n".join(lines)


if __name__ == "__main__":
    groups = load(REPO / "results" / "results.jsonl")
    print(render(groups))
    anchor_path = REPO / "results" / "torch_anchor.jsonl"
    if anchor_path.exists():
        print()
        print(render_anchor(groups, anchor_path))
