import time

import jax
import jax.numpy as jnp
import numpy as np

from sessionrec_tpu.models import init as I
from sessionrec_tpu.models.layers import RngGen, gat_apply
from sessionrec_tpu.ops.gat_fused import fused_intra_gat

B, N, D, H = 512, 20, 256, 8
cdt = jnp.bfloat16
p1 = jax.tree_util.tree_map(lambda x: x.astype(cdt),
                            I.gat_params(jax.random.PRNGKey(1), D, D, H,
                                         bound=0.0625))
p2 = jax.tree_util.tree_map(lambda x: x.astype(cdt),
                            I.gat_params(jax.random.PRNGKey(2), D, D, H,
                                         bound=0.0625))
f = jax.random.normal(jax.random.PRNGKey(3), (B, N, D)).astype(cdt)
adj = (jax.random.uniform(jax.random.PRNGKey(4), (B, N, N))
       < 0.2).astype(jnp.float32)


def fus(p1, p2, f, key):
    return fused_intra_gat(p1, p2, f, adj, RngGen(key), num_heads=H,
                           feat_drop=0.1, attn_drop=0.1, training=True)


def ref(p1, p2, f, key):
    rng = RngGen(key)
    kw = dict(num_heads=H, feat_drop=0.1, attn_drop=0.1, training=True)
    acc = gat_apply(p1, f, f, adj, rng, **kw)
    acc = acc + gat_apply(p2, f, f, jnp.swapaxes(adj, 1, 2), rng, **kw)
    return jnp.max(acc, axis=2)


for name, fn in (("fused", fus), ("dense", ref)):
    t0 = time.time()
    loss = jax.jit(lambda p1, p2, f, key:
                   jnp.sum(fn(p1, p2, f, key).astype(jnp.float32) ** 2))
    vg = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    key = jax.random.PRNGKey(0)
    l = loss(p1, p2, f, key)
    np.asarray(l)
    print(name, "fwd compiled+ran", round(time.time() - t0, 1),
          "loss", float(l), flush=True)
    t0 = time.time()
    g = vg(p1, p2, f, key)
    np.asarray(jax.tree_util.tree_leaves(g)[0])
    print(name, "bwd compiled+ran", round(time.time() - t0, 1), flush=True)
    t0 = time.time()
    for _ in range(20):
        l = loss(p1, p2, f, key)
        g = vg(p1, p2, f, key)
    np.asarray(l)
    np.asarray(jax.tree_util.tree_leaves(g)[0][0, :8])
    dt = (time.time() - t0) / 20
    print(f"{name}: fwd+bwd {dt*1e3:.2f} ms, loss={float(l):.1f}",
          flush=True)
