"""LESSR residual-step decomposition (round-5, VERDICT r4 item 8).

After the round-4 mailbox fix LESSR closed at 0.83% MFU with a ~3.3 ms
"everything else" step; round 5's split-batch build brings the step to
~1.8 ms at the realistic length distribution.  This probe decomposes
what remains by measuring the split-batch LESSR step at num_layers
0..3 on the real chip (reference geometry otherwise: dim 32, batch 512,
drop 0.2, bf16):

  t(0)        = embed + readout(+BN) + head BN + fused CE + optimizer
  t(1) - t(0) = EOPA 1 (mailbox one-hot contraction + masked GRU unroll)
  t(2) - t(1) = SGAT   (shortcut attention)
  t(3) - t(2) = EOPA 2 (wider input: concat growth 64 -> d)

plus a dim-128 run of the same shapes to expose the dim-32 lane-waste
factor (a [*, 32] tensor uses 32 of the VPU's 128 lanes; if 4x the
channel work costs much less than 4x the time, the dim-32 step is
lane-bound, not FLOP-bound).

Usage:  python scripts/probe_lessr_floor.py
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main():
    base = dict(model="lessr", batch=512, dim=32, feat_drop=0.2,
                lengths="real", split=8, bf16_only=True)
    rows = []
    for name, cfg in [
            (f"lessr-floor-L{k}", dict(base, layers=k))
            for k in range(4)] + [
            ("lessr-floor-L3-d128", dict(base, layers=3, dim=128))]:
        bench.CONFIGS[name] = cfg
        eps, fpe, mfu, _ = bench.run(name, "bfloat16", quiet=True)
        ms = cfg["batch"] / eps * 1e3
        rows.append(dict(name=name, layers=cfg["layers"], dim=cfg["dim"],
                         eps=round(eps, 1), ms_per_step=round(ms, 4),
                         mfu_pct=round((mfu or 0) * 100, 2)))
        print(json.dumps(rows[-1]), flush=True)
    t = {r["name"]: r["ms_per_step"] for r in rows}
    print(json.dumps({
        "base_ms (embed+readout+BN+CE+opt)": t["lessr-floor-L0"],
        "eopa1_ms": round(t["lessr-floor-L1"] - t["lessr-floor-L0"], 4),
        "sgat_ms": round(t["lessr-floor-L2"] - t["lessr-floor-L1"], 4),
        "eopa2_ms": round(t["lessr-floor-L3"] - t["lessr-floor-L2"], 4),
        "d128_vs_d32_step_ratio": round(
            t["lessr-floor-L3-d128"] / t["lessr-floor-L3"], 3),
    }))


if __name__ == "__main__":
    main()
