"""TrainRunner — the training loop (reference: src/utils/train.py:56-127).

Differences from the reference are capability additions, not behaviour
changes: the whole step (forward + backward + Adam + max-norm projection)
is one jitted XLA program with donated buffers; metrics and early
stopping reproduce the reference exactly (early stop only when *both*
MRR and HR worsened vs the running maxima, train.py:118-123; running
max-per-metric returned, train.py:124-127; one evaluation before any
training, train.py:91).  Checkpoint/resume is new, flag-gated.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sessionrec_tpu.ops import scoring
from sessionrec_tpu.train.optim import make_optimizer
from sessionrec_tpu.utils.logging import get_logger

log = get_logger(__name__)


def make_train_step(model, tx):
    """Build the jitted train step: project -> fwd -> bwd -> Adam."""

    def train_step(params, state, opt_state, batch, rng):
        params = model.project_params(params)   # torch max_norm semantics

        def loss_fn(p):
            log_probs, new_state = model.apply(p, state, batch,
                                               training=True, rng=rng)
            loss = scoring.nll_loss(log_probs, batch.labels, batch.valid)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def make_eval_step(model, cutoff=20):
    """Jitted eval step -> (hit_count, mrr_sum, num_valid) per batch."""

    def eval_step(params, state, batch):
        params = model.project_params(params)
        log_probs, _ = model.apply(params, state, batch, training=False,
                                   rng=None)
        ranks = scoring.topk_ranks(log_probs, batch.labels, cutoff)
        v = batch.valid
        hit = jnp.sum((ranks > 0) * v)
        mrr = jnp.sum(jnp.where(ranks > 0, 1.0 / jnp.maximum(ranks, 1), 0.0)
                      * v)
        return hit, mrr, jnp.sum(v)

    return jax.jit(eval_step)


def evaluate(eval_step, params, state, loader):
    """HR@cutoff / MRR@cutoff over a loader (reference: train.py:36-55)."""
    hit = mrr = n = 0.0
    for batch in loader:
        h, m, c = eval_step(params, state, batch)
        hit += float(h)
        mrr += float(m)
        n += float(c)
    n = max(n, 1.0)
    return mrr / n, hit / n


class TrainRunner:
    def __init__(self, model, train_loader, test_loader, *, lr=1e-3,
                 weight_decay=1e-4, patience=3, seed=123, cutoff=20,
                 lr_step_size=3, lr_gamma=0.1, eval_before_train=True,
                 checkpointer=None):
        self.model = model
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.patience = patience
        self.cutoff = cutoff
        self.eval_before_train = eval_before_train
        self.checkpointer = checkpointer

        key = jax.random.PRNGKey(seed)
        self.init_key, self.step_key = jax.random.split(key)
        self.params, self.state = model.init(self.init_key)
        self.tx = make_optimizer(self.params, lr, weight_decay,
                                 steps_per_epoch=len(train_loader),
                                 lr_step_size=lr_step_size, lr_gamma=lr_gamma)
        self.opt_state = self.tx.init(self.params)
        self.train_step = make_train_step(model, self.tx)
        self.eval_step = make_eval_step(model, cutoff)
        self.epoch = 0
        self.batch = 0

    def evaluate(self):
        return evaluate(self.eval_step, self.params, self.state,
                        self.test_loader)

    def train(self, epochs, log_interval=100):
        max_mrr = 0.0
        max_hit = 0.0
        bad_counter = 0
        t = time.time()
        mean_loss = 0.0
        interval_examples = 0

        if self.eval_before_train:
            mrr, hit = self.evaluate()
            log.info("initial eval: MRR = %.3f%%, Hit = %.3f%%",
                     mrr * 100, hit * 100)

        for _ in range(epochs):
            epoch_t = time.time()
            epoch_examples = 0
            pending_losses = []
            for batch in self.train_loader:
                self.step_key, sub = jax.random.split(self.step_key)
                (self.params, self.state, self.opt_state,
                 loss) = self.train_step(self.params, self.state,
                                         self.opt_state, batch, sub)
                # keep losses as device arrays — converting per step would
                # force a host sync and serialise dispatch with compute
                pending_losses.append(loss)
                bsz = int(np.sum(np.asarray(batch.valid)))
                interval_examples += bsz
                epoch_examples += bsz
                if self.batch > 0 and self.batch % log_interval == 0:
                    mean_loss += float(sum(map(float, pending_losses))) \
                        / log_interval
                    pending_losses = []
                    dt = time.time() - t
                    log.info(
                        "batch %d: loss = %.4f, %.1f examples/s, %.2fs",
                        self.batch, mean_loss,
                        interval_examples / max(dt, 1e-9), dt)
                    t = time.time()
                    mean_loss = 0.0
                    interval_examples = 0
                self.batch += 1
            if pending_losses:
                jax.block_until_ready(pending_losses[-1])

            mrr, hit = self.evaluate()
            log.info("epoch %d: MRR = %.3f%%, Hit = %.3f%% "
                     "(%.1f train examples/s)",
                     self.epoch, mrr * 100, hit * 100,
                     epoch_examples / max(time.time() - epoch_t, 1e-9))

            if self.checkpointer is not None:
                self.checkpointer.save(self.epoch, self.params, self.state,
                                       self.opt_state,
                                       metrics={"mrr": mrr, "hit": hit})

            # early stop only when BOTH metrics worsened (train.py:118-123)
            if mrr < max_mrr and hit < max_hit:
                bad_counter += 1
                if bad_counter == self.patience:
                    break
            else:
                bad_counter = 0
            max_mrr = max(max_mrr, mrr)
            max_hit = max(max_hit, hit)
            self.epoch += 1
        return max_mrr, max_hit
