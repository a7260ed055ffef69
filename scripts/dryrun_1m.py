"""Million-item-catalog mesh dryrun (VERDICT r3 item 3, mesh half).

The single-chip 1M-catalog numbers come from `bench.py --config
niser-1m` on real hardware.  This script validates the MULTI-CHIP path
at that catalog on the virtual CPU mesh the test suite uses:

* compile the full sharded train step (row-sharded table, ZeRO
  reduce-scatter, fused catalog-sharded CE) at P = 2^20 — proves the
  shardings, collectives, and shapes are consistent at the design-point
  catalog (compile-only: on CPU the Pallas CE kernel runs in interpret
  mode, and interpreting 2048 catalog tiles is hours);
* EXECUTE one sharded train step + sharded eval at P = 2^16 — a real
  end-to-end mesh execution two orders of magnitude above the unit
  tests' P=512, small enough for interpret mode;
* EXECUTE the sharded EVAL at the full P = 2^20 (round 5): the
  head-based counting eval (parallel/sharded.py:sharded_head_count_ranks)
  is plain XLA — scan + slab matmuls + three [B] psums, no Pallas — so
  unlike the train step it runs for real on the CPU mesh at the design
  point.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8
      JAX_PLATFORMS=cpu python scripts/dryrun_1m.py
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sessionrec_tpu.utils.backend import force_cpu_backend  # noqa: E402

force_cpu_backend(8)

import numpy as np  # noqa: E402
import jax  # noqa: E402


def build(num_items, batch_size):
    from sessionrec_tpu.graph import builders
    from sessionrec_tpu.graph.batch import SessionGraphBatch
    from sessionrec_tpu.models import NISER
    from sessionrec_tpu.parallel.mesh import make_mesh
    from sessionrec_tpu.parallel.sharded import init_sharded, place_batch
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import make_train_step

    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(0, num_items, size=rng.integers(2, 16)))
            for _ in range(batch_size)]
    labels = list(rng.integers(0, num_items, size=batch_size))
    batch = SessionGraphBatch(
        **builders.build_session_batch(seqs, labels, 16, batch_size))

    model = NISER(num_items=num_items, embedding_dim=64, num_layers=2,
                  compute_dtype="bfloat16", table_dtype="bfloat16")
    params, _ = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=1e-3, weight_decay=1e-4,
                        steps_per_epoch=100)
    mesh = make_mesh(data=4, model=2)
    params, state, opt_state = init_sharded(model, tx, mesh,
                                            jax.random.PRNGKey(0))
    batch = place_batch(mesh, batch)
    step = make_train_step(model, tx, fused=True, mesh=mesh)
    return model, mesh, step, params, state, opt_state, batch


def main():
    # 1) compile-only at the 2^20 design point
    t0 = time.time()
    model, mesh, step, params, state, opt_state, batch = build(1 << 20, 32)
    lowered = jax.jit(step).lower(params, state, opt_state, batch,
                                  jax.random.PRNGKey(1))
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    print(f"P=2^20 mesh {dict(mesh.shape)}: compiled in "
          f"{time.time() - t0:.0f}s; device memory "
          f"{getattr(mem, 'temp_size_in_bytes', 0) / 1e6:.0f} MB temp",
          flush=True)

    # 1b) EXECUTE the sharded eval at the full 2^20 design point — the
    # counting eval is Pallas-free, so this is a real execution, not a
    # compile check (uses the step-1 build's params/batch)
    from sessionrec_tpu.parallel.sharded import make_sharded_eval_step
    t0 = time.time()
    eval_step = make_sharded_eval_step(model, mesh, cutoff=20)
    hit, mrr, n = eval_step(params, state, batch)
    assert np.isfinite(float(mrr)) and float(n) == 32
    print(f"P=2^20 mesh {dict(mesh.shape)}: sharded counting EVAL "
          f"executed (n={float(n):.0f}, hit={float(hit):.0f}) in "
          f"{time.time() - t0:.0f}s — ok", flush=True)

    # 2) execute at 2^16 (interpret-mode Pallas; still 128 catalog tiles)
    t0 = time.time()
    model, mesh, step, params, state, opt_state, batch = build(1 << 16, 32)
    params, state, opt_state, loss = step(params, state, opt_state, batch,
                                          jax.random.PRNGKey(1))
    loss = float(loss)
    assert np.isfinite(loss), loss
    eval_step = make_sharded_eval_step(model, mesh, cutoff=20)
    hit, mrr, n = eval_step(params, state, batch)
    assert np.isfinite(float(mrr))
    print(f"P=2^16 mesh {dict(mesh.shape)}: one sharded train step "
          f"(loss={loss:.4f}) + sharded eval (n={float(n):.0f}) in "
          f"{time.time() - t0:.0f}s — ok", flush=True)


if __name__ == "__main__":
    main()
