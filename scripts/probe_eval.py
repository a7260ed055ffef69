"""Probe: streamed vs materialised eval throughput on the real chip.

Measures `make_unrolled_eval_step` (msgifsr-o1 at the bench shape,
catalog 37,484) in both modes — the VERDICT r2 item-5 before/after
record.  Run: python scripts/probe_eval.py  (needs the TPU).
"""

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (bench-scale constants + batch builder)


def main():
    import jax
    import jax.numpy as jnp
    from sessionrec_tpu.models import MSGIFSR
    from sessionrec_tpu.train.runner import (make_unrolled_eval_step,
                                             stack_batches)
    from sessionrec_tpu.train.session import _enable_compile_cache
    _enable_compile_cache()

    cfg = bench.CONFIGS["msgifsr-o1"]
    UNROLL = 16
    rng = np.random.default_rng(0)
    for dtype in ("float32", "bfloat16"):
        model = MSGIFSR(num_items=bench.NUM_ITEMS,
                        embedding_dim=cfg["dim"], num_layers=cfg["layers"],
                        order=cfg.get("order", 1), compute_dtype=dtype,
                        table_dtype="bfloat16" if dtype == "bfloat16"
                        else "float32")
        params, state = model.init(jax.random.PRNGKey(0))
        params = model.project_params(params)
        chunk = jax.device_put(stack_batches(
            bench.synthetic_batches(cfg, UNROLL, rng), UNROLL))
        for streamed in (False, True):
            step = make_unrolled_eval_step(model, streamed=streamed)
            h, m, n = step(params, state, chunk)   # compile
            float(np.asarray(h))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    h, m, n = step(params, state, chunk)
                float(np.asarray(h) + np.asarray(m))
                best = min(best, (time.perf_counter() - t0) / 5)
            eps = UNROLL * cfg["batch"] / best
            print(f"{dtype} streamed={streamed}: "
                  f"{best * 1e3 / UNROLL:.3f} ms/batch, {eps:,.0f} eval ex/s",
                  flush=True)


if __name__ == "__main__":
    main()
