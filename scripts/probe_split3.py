"""Probe: does a THIRD length tier pay?

Round-5 shipped two-tier length bucketing ([B_short, 8] + [B_long, 20]).
The realistic prefix distribution is much shorter still (mean 3.5,
median 2), and the split step is graph-side dominated (probe_o1_floor:
1.62 of 2.30 ms), so a [*, 4] tier could cut padded node slots ~33%
more.  Nested SplitBatches compose recursively through the model's
split handling, so this measures SplitBatch(SplitBatch(<=4@4, 5-8@8),
>8@20) against the shipped two-tier build on the real chip — same
example sets per step.

Run: python scripts/probe_split3.py [o1|o3]  (needs the TPU).
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def tiered_batches(cfg, n_batches, rng, tiers):
    """Nested SplitBatch with len(tiers)+1 groups: <=tiers[0], ...,
    rest at MAX_LEN.  Caps mirror bench.synthetic_batches' policy
    (round-32 epoch max per group)."""
    from sessionrec_tpu.graph.batch import SplitBatch
    B = cfg["batch"]
    raw = []
    for _ in range(n_batches):
        lens = rng.choice(bench.real_prefix_lengths(), size=B)
        seqs = [list(rng.integers(0, cfg.get("items", bench.NUM_ITEMS),
                                  size=l)) for l in lens]
        labels = list(rng.integers(0, cfg.get("items", bench.NUM_ITEMS),
                                   size=B))
        raw.append((seqs, labels))
    bounds = list(tiers) + [bench.MAX_LEN]
    parts = []
    for seqs, labels in raw:
        groups = [[] for _ in bounds]
        for s, l in zip(seqs, labels):
            for gi, hi in enumerate(bounds):
                if len(s) <= hi:
                    groups[gi].append((s, l))
                    break
        parts.append(groups)
    rnd = lambda x: max(-(-x // 32) * 32, 32)
    caps = [min(rnd(max(len(p[gi]) for p in parts)), B)
            for gi in range(len(bounds))]
    out = []
    for groups in parts:
        blocks = [bench._wrap_batch(cfg, None, [s for s, _ in g],
                                    [l for _, l in g], hi, cap)
                  for g, hi, cap in zip(groups, bounds, caps)]
        nested = blocks[0]
        for b in blocks[1:]:
            nested = SplitBatch(short=nested, long=b)
        out.append(nested)
    return out, caps


def time_step(model, tx, chunks, unroll):
    import jax
    from sessionrec_tpu.train.runner import make_train_step
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.jit(model.project_params)(params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)

    def run(chunk, params, state, opt_state):
        def body(c, batch):
            p, s, o = c
            p, s, o, loss = step(p, s, o, batch, key)
            return (p, s, o), loss
        _, losses = jax.lax.scan(body, (params, state, opt_state), chunk)
        return losses

    fn = jax.jit(run)
    args = (chunks, params, state, opt_state)
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / 5)
    return best / unroll


def main():
    import jax
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import stack_batches
    from sessionrec_tpu.train.session import _enable_compile_cache
    _enable_compile_cache()

    which = sys.argv[1] if len(sys.argv) > 1 else "o1"
    name = {"o1": "msgifsr-o1-real-split",
            "o3": "msgifsr-o3-paper-real-split",
            "lessr": "lessr-real-split"}[which]
    cfg = dict(bench.CONFIGS[name])
    unroll = 16
    model = bench.build_model(cfg, compute_dtype="bfloat16",
                              table_dtype="bfloat16")
    params, _ = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-3, weight_decay=1e-4,
                        steps_per_epoch=100)
    B = cfg["batch"]

    for label, tiers in (("two-tier (8)", (8,)), ("three-tier (4,8)",
                                                  (4, 8)),
                         ("three-tier (2,8)", (2, 8)),
                         ("four-tier (2,4,8)", (2, 4, 8))):
        rng = np.random.default_rng(0)      # same example stream
        batches, caps = tiered_batches(cfg, unroll, rng, tiers)
        chunk = jax.device_put(stack_batches(batches, unroll))
        t = time_step(model, tx, chunk, unroll)
        slots = "+".join(str(c) for c in caps)
        print(f"{label:>18}: caps [{slots}] -> {1e3 * t:.3f} ms/step "
              f"({B / t:,.0f} ex/s)", flush=True)


if __name__ == "__main__":
    main()
