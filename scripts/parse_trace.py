"""Summarize a jax.profiler trace: device-time by HLO op category.

Finds the newest ``*.trace.json.gz`` under the given directory (the
Perfetto dump jax.profiler writes), keeps events on TPU device tracks,
and prints total device-μs by op-name bucket, descending — the table
BENCH_NOTES.md's per-op profiles are built from.

Usage: python scripts/parse_trace.py DIR [--steps N] [--top K]
  --steps divides totals to per-step μs (count your timed steps).
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import pathlib
import re


def load_events(trace_dir):
    paths = sorted(pathlib.Path(trace_dir).rglob("*.trace.json.gz"),
                   key=lambda p: p.stat().st_mtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def device_pids(events):
    """pids whose process name looks like a TPU device (not host threads)."""
    names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev["args"].get("name", "")
    return {pid for pid, name in names.items()
            if re.search(r"TPU|/device:|XLA", name, re.I)
            and "host" not in name.lower()}


def bucket(name):
    """Collapse op instance names to a readable bucket."""
    n = name.split("/")[-1]
    n = re.sub(r"[.\d]+$", "", n)           # strip instance counters
    for pat, label in [
        (r"^fusion", "fusion"), (r"^loop_fusion", "fusion"),
        (r"^input_fusion", "fusion"), (r"^output_fusion", "fusion"),
        (r"^copy", "copy"), (r"^transpose", "transpose"),
        (r"^convert", "convert"), (r"^dot", "dot"),
        (r"^custom-call", "custom-call"), (r"^all-", "collective"),
        (r"^reduce-scatter", "collective"), (r"^dynamic", "dynamic-slice"),
        (r"^select", "select"), (r"^scatter", "scatter"),
        (r"^gather", "gather"), (r"^rng", "rng"),
    ]:
        if re.match(pat, n):
            return label
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=float, default=1.0)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--raw", action="store_true",
                    help="group by full op name instead of bucket")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    pids = device_pids(events)
    by_name = collections.Counter()
    by_bucket = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in pids:
            continue
        name = ev.get("name", "?")
        # skip trace-framework meta events
        if name.startswith(("$", "Steps", "XLA Modules", "tpu::")):
            continue
        dur = float(ev.get("dur", 0.0))
        total += dur
        by_name[name] += dur
        by_bucket[bucket(name)] += dur

    src = by_name if args.raw else by_bucket
    print(f"total device-us/step: {total / args.steps:,.0f}  "
          f"(tracks: {len(pids)})")
    for name, us in src.most_common(args.top):
        print(f"{us / args.steps:10,.1f} us  {100 * us / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
