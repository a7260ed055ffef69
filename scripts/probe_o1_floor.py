"""Decompose the headline split-step (msgifsr-o1-real-split) wall time.

probe_lessr_floor.py's method at the o1 geometry: time nested slices of
the step on the real chip —

  head      : head_multi forward only (graph side)
  head+bwd  : forward + backward of a CE-free surrogate loss (graph side
              round trip without the catalog)
  ce        : fused softmax-CE forward+backward at fixed (sr, table)
  opt       : Adam + bf16 table update at fixed grads
  full      : the real train step

Pieces don't sum exactly (XLA fuses across boundaries in the full
step), but they bound where the milliseconds live.

Run: python scripts/probe_o1_floor.py  (needs the TPU).
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def timed(fn, args, unroll, reps=3, inner=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / inner)
    return best / unroll


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from sessionrec_tpu.ops import xent
    from sessionrec_tpu.train.optim import make_optimizer
    from sessionrec_tpu.train.runner import (make_train_step, make_loss_fn,
                                             stack_batches)
    from sessionrec_tpu.train.session import _enable_compile_cache
    _enable_compile_cache()

    cfg = bench.CONFIGS["msgifsr-o1-real-split"]
    unroll = 16
    rng = np.random.default_rng(0)
    model = bench.build_model(cfg, compute_dtype="bfloat16",
                              table_dtype="bfloat16")
    params, state = model.init(jax.random.PRNGKey(0))
    params = model.project_params(params)
    tx = make_optimizer(params, lr=1e-3, weight_decay=1e-4,
                        steps_per_epoch=100)
    opt_state = tx.init(params)
    chunk = jax.device_put(stack_batches(
        bench.synthetic_batches(cfg, unroll, rng), unroll))
    key = jax.random.PRNGKey(1)

    def scan_over(body):
        def run(*args):
            def step(c, batch):
                return c, body(batch, *args)
            _, out = jax.lax.scan(step, 0, chunk)
            return out
        return jax.jit(run)

    # 1. graph-side forward
    def head_fwd(batch, params):
        from sessionrec_tpu.models.layers import split_rngs
        rs, rl = split_rngs(key)
        sr_s, *_ = model.head_multi(params, state, batch.short,
                                    training=True, rng=rs)
        sr_l, *_ = model.head_multi(params, state, batch.long,
                                    training=True, rng=rl)
        return jnp.sum(sr_s.astype(jnp.float32)) + \
            jnp.sum(sr_l.astype(jnp.float32))

    t_head = timed(scan_over(head_fwd), (params,), unroll)

    # 2. graph-side forward+backward (CE-free surrogate; reduce over the
    # WHOLE grad tree or XLA dead-code-eliminates the backward)
    def head_grad(batch, params):
        g = jax.grad(lambda p: head_fwd(batch, p))(params)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(g))

    t_headbwd = timed(scan_over(head_grad), (params,), unroll)

    # 3. fused CE fwd+bwd at fixed sr (isolates the catalog kernel)
    B = cfg["batch"]
    d = cfg["dim"]
    sr = jnp.asarray(rng.normal(size=(B, d)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, model.num_items, B), jnp.int32)
    valid = jnp.ones((B,), jnp.bool_)

    def ce_only(batch, params, sr):
        def loss(p, s):
            return xent.fused_nll_loss(
                s, p["embedding"], labels, valid, scale=float(model.scale),
                num_items=model.num_items,
                normalize_table=getattr(model, "table_norm", False))
        gsr, gtab = jax.grad(loss, argnums=(0, 1))(params, sr)
        return jnp.sum(gsr["embedding"].astype(jnp.float32)[0]) + \
            jnp.sum(gtab.astype(jnp.float32)[0])

    t_ce = timed(scan_over(ce_only), (params, sr), unroll)

    # 4. optimizer + bf16 table round at fixed grads (large pytrees ride
    # as ARGUMENTS — closed-over they become embedded program constants
    # and blow the remote-compile request limit)
    grads = jax.tree.map(lambda x: jnp.ones_like(
        x, jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype), params)

    def opt_only(batch, params, opt_state, grads):
        from sessionrec_tpu.train.runner import _apply_updates_project
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = _apply_updates_project(model, params, updates, key)
        return new_params["alpha"]

    t_opt = timed(scan_over(opt_only), (params, opt_state, grads), unroll)

    # 5. the real thing
    step = make_train_step(model, tx)

    def full(chunk, params, state, opt_state):
        def body(c, batch):
            p, s, o = c
            p, s, o, loss = step(p, s, o, batch, key)
            return (p, s, o), loss
        (_, _, _), losses = jax.lax.scan(body, (params, state, opt_state),
                                         chunk)
        return losses

    # the runner's own unrolled step exists, but timing the same scan
    # shape as the probes keeps the comparison apples-to-apples
    t_full = timed(jax.jit(full), (chunk, params, state, opt_state), unroll)

    print(f"head fwd           : {1e3 * t_head:.3f} ms/step")
    print(f"head fwd+bwd       : {1e3 * t_headbwd:.3f} ms/step")
    print(f"fused CE fwd+bwd   : {1e3 * t_ce:.3f} ms/step")
    print(f"optimizer+SR table : {1e3 * t_opt:.3f} ms/step")
    print(f"full train step    : {1e3 * t_full:.3f} ms/step "
          f"({cfg['batch'] / t_full:,.0f} ex/s)")
