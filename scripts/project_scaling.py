"""v5e-16 scaling projection from compiled-HLO collective bytes
(VERDICT r3 item 8).

This environment exposes ONE real TPU chip, so multi-chip scaling cannot
be measured.  The closest honest approximation: compile the real mesh
train step on a virtual CPU device mesh at the production geometry,
count the bytes every collective moves (same parser as
tests/test_zero_opt.py), and bound the per-step communication time
against ICI bandwidth.  Projected efficiency at data-parallel dp is then

    eff(dp) = t_compute / (t_compute + t_comm(dp))

with t_compute = the measured single-chip step time (BENCH_r03 /
BENCH_r04 — per-chip batch is held constant, weak scaling) and t_comm
from the collective-byte count under a ring model:

    all-reduce   moves 2*(n-1)/n * bytes per chip
    reduce-scatter / all-gather move (n-1)/n * bytes per chip

ICI assumption (stated, not measured): TPU v5e has a 2D torus with
one-way per-link bandwidth ~4.5e10 B/s and 2 links usable per axis
direction pair ("How to Scale Your Model", jax-ml.github.io/scaling-book,
v5e row).  A dp ring laid out along one torus axis rides 2 links
(both directions) => ring bandwidth BW_ring ~ 9e10 B/s per chip.
DCN is NOT assumed — the projection is for a single v5e-16 slice.

Round 5: the step is AOT-compiled against a REAL v5e TPU topology by
default (``jax.experimental.topologies.get_topology_desc`` — needs
libtpu but no hardware), so the counted HLO carries the TPU backend's
actual collective dtypes and GSPMD choices.  The earlier CPU-mesh HLO
promoted every bf16 reduction collective to f32 (a CPU backend
artifact that overstated ring bytes 2x for the bf16-wire reductions);
``--cpu`` keeps that path as a fallback for environments without
libtpu.

Usage:
  python scripts/project_scaling.py [--step-ms 3.94] [--dp 8 16] [--mp 2]
  (add --cpu to force the virtual CPU mesh; then set
   XLA_FLAGS=--xla_force_host_platform_device_count=16 JAX_PLATFORMS=cpu)
Prints a markdown table for BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

_USE_CPU = "--cpu" in sys.argv

if _USE_CPU:
    from sessionrec_tpu.utils.backend import force_cpu_backend
    force_cpu_backend(16)

import numpy as np  # noqa: E402
import jax  # noqa: E402

BW_LINK = 4.5e10          # B/s one-way per ICI link (v5e, scaling book)
BW_RING = 2 * BW_LINK     # ring along one torus axis uses both directions


def mesh_devices(n):
    """n devices for the mesh: AOT v5e topology devices by default
    (real TPU HLO, no hardware needed), the virtual CPU mesh under
    --cpu."""
    if _USE_CPU:
        return jax.devices()[:n]
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:4x4")
    devs = list(topo.devices)
    assert n <= len(devs), (n, len(devs))
    return devs[:n]


def compiled_hlo(dp, mp, batch_per_chip=512, dim=256, order=1,
                 num_items=37000, split=None):
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import CcsBatch, CcsLevel
    from sessionrec_tpu.models import MSGIFSR
    from sessionrec_tpu.parallel import mesh as M
    from sessionrec_tpu.parallel import sharded as S
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import make_train_step

    B = batch_per_chip * dp
    rng = np.random.default_rng(0)
    n_real = 64   # tiny real content; shapes are what matters
    seqs = [list(rng.integers(0, num_items, size=rng.integers(2, 16)))
            for _ in range(n_real)]
    labels = list(rng.integers(0, num_items, size=n_real))
    def mk(seqs2, labels2, max_len, size):
        d = builders.build_ccs_batch(seqs2, labels2, order, max_len, size)
        return CcsBatch(levels=tuple(CcsLevel(**lv) for lv in d["levels"]),
                        inter_in=tuple(d["inter_in"]),
                        inter_out=tuple(d["inter_out"]),
                        labels=d["labels"], valid=d["valid"])
    if split:
        # length-bucketed batch at the realistic caps the bench measured
        # (tier caps ~ (3/4 B, B/4, B/8) at the (4, 8) default); --split
        # takes one threshold or a comma list, e.g. "4,8"
        from sessionrec_tpu.graph.batch import nest_blocks
        tiers = [int(t) for t in str(split).split(",")]
        bounds = tiers + [20]
        caps = [max(B >> (2 * i), 32) for i in range(len(bounds))]
        caps[0] = B
        groups = [([], []) for _ in bounds]
        for x, l in zip(seqs, labels):
            for gi, hi in enumerate(bounds):
                if len(x) <= hi:
                    groups[gi][0].append(x)
                    groups[gi][1].append(l)
                    break
        batch = nest_blocks([mk(gs, gl, hi, cap)
                             for (gs, gl), hi, cap
                             in zip(groups, bounds, caps)])
    else:
        batch = mk(seqs, labels, 20, B)

    model = MSGIFSR(num_items=num_items, embedding_dim=dim, num_layers=1,
                    feat_drop=0.1, order=order,
                    compute_dtype="bfloat16", table_dtype="bfloat16")
    params, _ = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-3, weight_decay=1e-4,
                        steps_per_epoch=100)
    mesh = M.make_mesh(data=dp, model=mp, devices=mesh_devices(dp * mp))
    step = make_train_step(model, tx, fused=True, mesh=mesh)
    ops = S.abstract_step_operands(mesh, model, tx, batch)
    return step.lower(*ops).compile().as_text()


def collectives(hlo_text, default_n):
    """[(kind, result_bytes, group_size)] — group size parsed from each
    op's replica_groups so model-axis collectives are costed on the
    model ring, not the data ring.  Dedup/parse logic lives in
    sessionrec_tpu/utils/hlo.py (TPU async chunking repeats one logical
    collective many times in the HLO text)."""
    from sessionrec_tpu.utils.hlo import collective_ops
    return [(kind, total, group)
            for kind, total, group, _ in collective_ops(hlo_text, default_n)]


def ring_time(kind, result_bytes, n):
    """Seconds to move `result_bytes` (the collective's RESULT size, as
    counted from HLO shapes) around an n-chip ring at BW_RING."""
    if n <= 1:
        return 0.0
    if kind == "all-reduce":
        wire = 2 * (n - 1) / n * result_bytes
    elif kind in ("reduce-scatter", "all-gather"):
        # HLO reports the output shape; per-chip wire volume for both is
        # (n-1)/n of the LARGE (gathered) buffer.  reduce-scatter output
        # is the small shard -> scale up by n first.
        big = result_bytes * (n if kind == "reduce-scatter" else 1)
        wire = (n - 1) / n * big
    else:   # collective-permute / all-to-all: one hop
        wire = result_bytes
    return wire / BW_RING


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=3.94,
                    help="measured single-chip step time for the same "
                         "per-chip geometry (headline msgifsr-o1 bf16)")
    ap.add_argument("--dp", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--mp", type=int, default=1)
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--split", type=str, default=None,
                    help="compile the length-bucketed (SplitBatch) step: "
                         "one threshold or a comma list (e.g. '4,8', the "
                         "production default) instead of the unsplit one")
    ap.add_argument("--cpu", action="store_true",
                    help="count the virtual-CPU-mesh HLO instead of the "
                         "AOT TPU one (CPU promotes bf16 reduction "
                         "collectives to f32 — conservative bytes)")
    args = ap.parse_args()

    from test_zero_opt import collective_bytes

    print(f"| dp | mp | collective result bytes/step | t_comm (ms) | "
          f"t_step 1-chip (ms) | projected eff |")
    print("|---|---|---|---|---|---|")
    for dp in args.dp:
        n_dev = dp * args.mp
        try:
            mesh_devices(n_dev)
        except Exception as e:
            print(f"| {dp} | {args.mp} | needs {n_dev} devices ({e}) "
                  f"| - | - | - |")
            continue
        hlo = compiled_hlo(dp, args.mp, order=args.order,
                           split=args.split)
        colls = collectives(hlo, dp)
        t_comm = sum(ring_time(k, b, g) for k, b, g in colls)
        eff = args.step_ms / (args.step_ms + 1e3 * t_comm)
        agg = {}
        for k, b, g in colls:
            agg[(k, g)] = agg.get((k, g), 0) + b
        pretty = ", ".join(f"{k}(ring {g}): {b / 1e6:.1f} MB"
                           for (k, g), b in sorted(agg.items()))
        print(f"| {dp} | {args.mp} | {pretty} | {1e3 * t_comm:.2f} | "
              f"{args.step_ms:.2f} | {100 * eff:.1f}% |")
        _, shapes = collective_bytes(hlo)
        for k, ss in sorted(shapes.items()):
            print(f"    {k}: {ss[:6]}")


if __name__ == "__main__":
    main()
