"""Checkpoint/resume — a new capability (the reference never saves the
model, SURVEY.md §5), flag-gated and default-off for parity.

Uses orbax-checkpoint for sharded-pytree save/restore (works for both
replicated single-chip and row-sharded multi-chip tables).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np

from sessionrec_tpu.utils.logging import get_logger

log = get_logger(__name__)


class Checkpointer:
    def __init__(self, directory):
        import orbax.checkpoint as ocp
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def save(self, epoch, runner, metrics=None):
        """Snapshot everything a bit-identical resume needs: params,
        model state, optimizer state, the dropout PRNG stream
        (``step_key``), and the loop counters / early-stop bookkeeping
        (in the sidecar json)."""
        path = self.dir / f"epoch_{epoch:04d}"
        tree = {"params": runner.params, "state": runner.state,
                "opt_state": runner.opt_state, "step_key": runner.step_key}
        self._ckpt.save(path, tree, force=True)
        # the array save above is collective (all processes participate);
        # the sidecar metadata is written once, by the primary
        if jax.process_index() == 0:
            meta = {"epoch": epoch, "metrics": metrics or {},
                    "batch": runner.batch,
                    "max_mrr": runner.max_mrr, "max_hit": runner.max_hit,
                    "bad_counter": runner.bad_counter}
            with open(self.dir / f"epoch_{epoch:04d}.json", "w") as f:
                json.dump(meta, f)
        log.info("saved checkpoint %s", path)

    def latest_epoch(self):
        epochs = sorted(int(p.stem.split("_")[1])
                        for p in self.dir.glob("epoch_*.json"))
        return epochs[-1] if epochs else None

    def restore_latest(self, runner):
        ep = self.latest_epoch()
        if ep is None:
            log.info("no checkpoint to resume from in %s", self.dir)
            return False
        path = self.dir / f"epoch_{ep:04d}"
        template = {"params": runner.params, "state": runner.state,
                    "opt_state": runner.opt_state,
                    "step_key": runner.step_key}
        tree = self._ckpt.restore(path, item=template)
        runner.params = tree["params"]
        runner.state = tree["state"]
        runner.opt_state = tree["opt_state"]
        runner.step_key = tree["step_key"]
        with open(self.dir / f"epoch_{ep:04d}.json") as f:
            meta = json.load(f)
        runner.epoch = ep + 1
        runner.batch = int(meta.get("batch", 0))
        runner.max_mrr = float(meta.get("max_mrr", 0.0))
        runner.max_hit = float(meta.get("max_hit", 0.0))
        runner.bad_counter = int(meta.get("bad_counter", 0))
        log.info("resumed from %s (epoch %d)", path, ep)
        return True
