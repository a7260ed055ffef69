"""Probe: lax.top_k vs counting label ranks in the real eval step.

Measures `make_unrolled_eval_step(rank_method=...)` on the real chip at
two catalog scales — yoochoose-1/4 (msgifsr-o1, P=37.5k) and the
serving-scale design point (niser-1m, P=2^20) — the measurement behind
runner._use_count_ranks's always-count default.  Both methods return
bit-identical metrics
(asserted here on-device and in tests/test_runner_unroll.py).

Run: python scripts/probe_rank.py  (needs the TPU).
"""

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main():
    import jax
    from sessionrec_tpu.train.runner import (make_unrolled_eval_step,
                                             stack_batches)
    from sessionrec_tpu.train.session import _enable_compile_cache
    _enable_compile_cache()

    rng = np.random.default_rng(0)
    for name, unroll in (("msgifsr-o1", 16), ("niser-1m", 8)):
        cfg = bench.CONFIGS[name]
        model = bench.build_model(cfg, compute_dtype="bfloat16",
                                  table_dtype="bfloat16")
        params, state = model.init(jax.random.PRNGKey(0))
        params = model.project_params(params)
        chunk = jax.device_put(stack_batches(
            bench.synthetic_batches(cfg, unroll, rng), unroll))
        metrics = {}
        for method in ("topk", "count"):
            step = make_unrolled_eval_step(model, rank_method=method)
            h, m, n = step(params, state, chunk)   # compile
            float(np.asarray(h))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    h, m, n = step(params, state, chunk)
                float(np.asarray(h) + np.asarray(m))
                best = min(best, (time.perf_counter() - t0) / 5)
            metrics[method] = (float(np.asarray(h)), float(np.asarray(m)))
            eps = unroll * cfg["batch"] / best
            print(f"{name} P={model.padded_items} rank_method={method}: "
                  f"{best * 1e3 / unroll:.3f} ms/batch, "
                  f"{eps:,.0f} eval ex/s", flush=True)
        assert metrics["topk"] == metrics["count"], metrics


if __name__ == "__main__":
    main()
