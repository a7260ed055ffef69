"""Probe: exact vs approx top-k recommendation throughput (serving).

Measures the serving scoring step (raw masked logits -> top-k item ids)
at the niser-1m geometry (B=512, P=2^20, bf16) on the real chip, with
the catalog sort done by ``lax.top_k`` (exact) vs ``lax.approx_max_k``
(TPU PartialReduce, bounded recall).  Also measures the ACHIEVED recall
of the approx path against the exact ids on the same scores.

Run: python scripts/probe_serving.py  (needs the TPU).
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
    import jax.numpy as jnp
    from sessionrec_tpu.models.layers import l2norm
    from sessionrec_tpu.ops import scoring
    from sessionrec_tpu.ops.masked import NEG_INF
    from sessionrec_tpu.train.runner import stack_batches
    from sessionrec_tpu.train.session import _enable_compile_cache
    _enable_compile_cache()

    cfg = bench.CONFIGS["niser-1m"]
    unroll, k = 8, 20
    rng = np.random.default_rng(0)
    model = bench.build_model(cfg, compute_dtype="bfloat16",
                              table_dtype="bfloat16")
    params, state = model.init(jax.random.PRNGKey(0))
    params = model.project_params(params)
    chunk = jax.device_put(stack_batches(
        bench.synthetic_batches(cfg, unroll, rng), unroll))

    def scores_of(batch):
        sr, table, _ = model.head(params, state, batch, training=False,
                                  rng=None)
        table = l2norm(table)                      # niser table_norm
        logits = scoring.catalog_logits(sr, table, compute_dtype=model.cdt)
        imask = scoring.item_mask(model.num_items, model.padded_items)
        return jnp.where(imask.astype(bool), logits, NEG_INF)

    def make(method, recall_target=0.95):
        def body(carry, batch):
            s = scores_of(batch)
            if method == "approx":
                v, i = jax.lax.approx_max_k(s, k,
                                            recall_target=recall_target)
            else:
                v, i = jax.lax.top_k(s, k)
            return carry, i

        def run(chunk):
            _, ids = jax.lax.scan(body, 0, chunk)
            return ids

        return jax.jit(run)

    ids_by = {}
    for method, rt in (("exact", None), ("approx", 0.95), ("approx", 0.99)):
        fn = make(method, rt or 0.95)
        ids = fn(chunk)
        np.asarray(ids)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                ids = fn(chunk)
            np.asarray(ids)
            best = min(best, (time.perf_counter() - t0) / 5)
        key = f"{method}{'' if rt is None else f'@{rt}'}"
        ids_by[key] = np.asarray(ids).reshape(-1, k)
        eps = unroll * cfg["batch"] / best
        print(f"{key}: {best * 1e3 / unroll:.3f} ms/batch, "
              f"{eps:,.0f} sessions/s", flush=True)

    exact = ids_by["exact"]
    for key, ids in ids_by.items():
        if key == "exact":
            continue
        rec = np.mean([len(np.intersect1d(exact[r], ids[r])) / k
                       for r in range(exact.shape[0])])
        print(f"{key}: achieved recall@{k} vs exact = {rec:.4f}")


if __name__ == "__main__":
    main()
