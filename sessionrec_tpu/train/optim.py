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


def make_optimizer(params, lr, weight_decay, steps_per_epoch,
                   lr_step_size=3, lr_gamma=0.1):
    parts = []
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay,
                                               mask=decay_mask(params)))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    schedule = step_lr(lr, steps_per_epoch, lr_step_size, lr_gamma)
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
