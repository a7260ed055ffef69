"""The fused head()+xent training-loss path must agree with the
apply()+nll path (values AND gradients) for every plain-head model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sessionrec_tpu.graph import builders
from sessionrec_tpu.train.runner import make_loss_fn


def _batch(kind, order=1, num_items=300, B=8, seed=0):
    from sessionrec_tpu.data.loader import BatchLoader
    rng = np.random.default_rng(seed)
    sessions = [list(rng.integers(0, num_items,
                                  size=rng.integers(2, 12)))
                for _ in range(B + 1)]
    loader = BatchLoader(sessions, kind, B, 20, order=order)
    return next(iter(loader))


@pytest.mark.parametrize("name,kw", [
    ("srgnn", {}),
    ("niser", {}),
    pytest.param("lessr", dict(num_layers=2), marks=pytest.mark.slow),
    ("msgifsr", dict(order=1)),
    # plain head: order-1 score
    pytest.param("msgifsr", dict(order=2, fusion=False),
                 marks=pytest.mark.slow),
])
def test_fused_loss_matches_apply(name, kw):
    from sessionrec_tpu.models import build_model
    from sessionrec_tpu.utils.config import preset

    cfg = preset(name, embedding_dim=32, **kw)
    model = build_model(cfg.model, 300)
    assert model.has_plain_head
    params, state = model.init(jax.random.PRNGKey(0))
    params = model.project_params(params)
    batch = _batch(model.graph_kind, order=getattr(model, "order", 1))
    rng = jax.random.PRNGKey(1)

    def run(fused):
        loss_fn = make_loss_fn(model, state, batch, rng, fused=fused)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    lf, gf = run(True)
    la, ga = run(False)
    np.testing.assert_allclose(float(lf), float(la), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_a = jax.tree_util.tree_leaves(ga)
    for a, b in zip(flat_f, flat_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_renorm_loss_still_uses_apply():
    """MSGIFSR with REnorm (extra=True) has no plain head — the loss path
    must fall back to apply()."""
    from sessionrec_tpu.models import build_model
    from sessionrec_tpu.utils.config import preset
    cfg = preset("msgifsr", embedding_dim=32, order=2, extra=True,
                 fusion=True)
    model = build_model(cfg.model, 300)
    assert not model.has_plain_head
