"""Optimizer reproducing the reference trainer's update rule.

torch ``Adam(lr, weight_decay)`` with a no-decay param group for
bias / batch-norm / activation parameters (reference: train.py:12-23,74)
plus ``StepLR(step_size=3, gamma=0.1)`` stepped per epoch (train.py:75).

torch Adam's ``weight_decay`` adds ``wd * param`` to the *gradient*
before the moment updates (not AdamW), so the optax chain is
``add_decayed_weights -> scale_by_adam -> -lr``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

# param-tree keys that mark a no-decay leaf, mirroring the reference's
# name-substring rule ['bias', 'batch_norm', 'activation'] (train.py:18):
#   b / b_ih / b_hh / bias -> torch '*.bias*'; bn -> '*batch_norm*';
#   act -> '*activation*' (PReLU slopes)
_NO_DECAY_KEYS = {"b", "b_ih", "b_hh", "bias", "bn", "act"}


def decay_mask(params):
    """True where weight decay applies."""
    def mask_path(path, leaf):
        for entry in path:
            key = getattr(entry, "key", getattr(entry, "name", None))
            if key in _NO_DECAY_KEYS:
                return False
        return True
    return jax.tree_util.tree_map_with_path(mask_path, params)


def step_lr(base_lr: float, steps_per_epoch: int, step_size: int = 3,
            gamma: float = 0.1):
    """StepLR(step_size, gamma) as a per-optimizer-step schedule."""
    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * (gamma ** (epoch // step_size))
    return schedule


def _scale_by_adam_f32(b1=0.9, b2=0.999, eps=1e-8):
    """``scale_by_adam`` with float32 moments for low-precision params.

    With a bfloat16-stored embedding table, plain ``scale_by_adam``
    inherits bf16 for mu/nu and updates them round-to-nearest; the nu
    increment ``(1-b2) g^2 = 1e-3 g^2`` sits below bf16's half-ulp once
    nu is warm, so the second moment freezes and ``0.999 * nu`` cannot
    decay.  Moments are optimizer state, not the stochastic-rounded
    table itself (ops/sround.py covers only the table), so the fix is
    simply to keep both moments float32: init them from f32-cast param
    templates and upcast incoming bf16 gradients before the moment
    arithmetic.  Costs 2 extra bytes/param/moment on the table only.
    """
    inner = optax.scale_by_adam(b1=b1, b2=b2, eps=eps,
                                mu_dtype=jnp.float32)

    def init(params):
        return inner.init(_cast_f32(params))

    def update(updates, state, params=None):
        return inner.update(_cast_f32(updates), state, params)

    return optax.GradientTransformation(init, update)


def _cast_f32(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if x.dtype == jnp.bfloat16 else x, tree)


def _upcast_grads():
    """Head-of-chain upcast of bf16 gradients to float32, so the
    weight-decay add (``g + wd * p``, wd=1e-4) is not rounded away in
    bf16 when ``|wd * p| < 2^-9 |g|``."""
    return optax.GradientTransformation(
        lambda params: optax.EmptyState(),
        lambda updates, state, params=None: (_cast_f32(updates), state))


def make_optimizer(params, lr, weight_decay, steps_per_epoch,
                   lr_step_size=3, lr_gamma=0.1):
    parts = [_upcast_grads()]
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay,
                                               mask=decay_mask(params)))
    parts.append(_scale_by_adam_f32(b1=0.9, b2=0.999, eps=1e-8))
    schedule = step_lr(lr, steps_per_epoch, lr_step_size, lr_gamma)
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
