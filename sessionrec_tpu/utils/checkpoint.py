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
        tree = strict_err = None
        try:
            tree = self._ckpt.restore(path, item=template)
        except Exception as e:          # shape/dtype drift → migrate below
            strict_err = e
        if tree is None:
            tree = self._migrate_restore(path, template, strict_err)
        else:
            # some orbax versions silently restore the SAVED shape/dtype
            # into the template tree rather than raising — post-validate
            # (attribute reads only; no device-to-host copies)
            def sd(x):
                return (getattr(x, "shape", np.shape(x)),
                        getattr(x, "dtype", np.asarray(x).dtype))
            drift = [
                f"{jax.tree_util.keystr(kp)}: saved {sd(r)} vs "
                f"template {sd(t)}"
                for (kp, t), r in zip(
                    jax.tree_util.tree_leaves_with_path(template),
                    jax.tree_util.tree_leaves(tree))
                if sd(r) != sd(t)]
            if drift:
                tree = self._migrate_restore(
                    path, template, f"shape/dtype drift: {drift[:4]}")
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

    def restore_subtree(self, template, concrete_factory=None):
        """Restore only the given top-level subtree of the latest
        checkpoint (e.g. ``{"params": ..., "state": ...}``) — nothing
        else in the saved tree is read or materialised.

        Serving restores through this: a training checkpoint carries
        f32 Adam moments the size of two embedding tables, and the old
        full-template restore allocated them at inference start only to
        discard them (~512 MB at P=2^20 d=256).  It also means serving
        works from a checkpoint directory whose ``opt_state`` entry was
        deleted to save space.

        ``template`` may hold abstract leaves (``jax.ShapeDtypeStruct``,
        e.g. from ``jax.eval_shape``) — only structure/shape/dtype are
        consulted on the happy path.  On shape/dtype drift the catalog-
        axis migration needs concrete template rows to pad with;
        ``concrete_factory()`` (called only then) must return a concrete
        template of the same structure.  Returns None when the directory
        has no checkpoint.
        """
        ep = self.latest_epoch()
        if ep is None:
            return None
        path = self.dir / f"epoch_{ep:04d}"
        import orbax.checkpoint as ocp
        ra = jax.tree_util.tree_map(lambda _: ocp.RestoreArgs(), template)
        tree = strict_err = None
        try:
            tree = self._ckpt.restore(path, item=template, transforms={},
                                      restore_args=ra)
        except Exception as e:
            strict_err = e
        if tree is not None:
            def sd(x):
                return (getattr(x, "shape", np.shape(x)),
                        getattr(x, "dtype", np.asarray(x).dtype))
            drift = [
                f"{jax.tree_util.keystr(kp)}: saved {sd(r)} vs "
                f"template {sd(t)}"
                for (kp, t), r in zip(
                    jax.tree_util.tree_leaves_with_path(template),
                    jax.tree_util.tree_leaves(tree))
                if sd(r) != sd(t)]
            if not drift:
                return tree
            strict_err = f"shape/dtype drift: {drift[:4]}"
        concrete = concrete_factory() if concrete_factory is not None \
            else template
        return self._migrate_restore(path, concrete, strict_err)

    def _migrate_restore(self, path, template, strict_err):
        """Shape-drift migration (VERDICT r3 item 6).

        Checkpoints written under a different ``pad_catalog`` multiple
        (ops/scoring.py — e.g. the round-1 128-padding vs today's 512)
        carry embedding-table / Adam-moment rows at a different padded
        catalog size; orbax's strict template restore fails on them with
        an opaque shape error.  Recoverable drift is migrated here:

        * catalog-axis drift — a 2D+ leaf on an ``embedding`` path whose
          trailing dims match the template but whose row count differs:
          pad with the template's own rows (fresh-init rows for params,
          zeros for moments; both are masked-out padding at runtime) or
          slice down.  Real items always occupy rows [0, num_items), so
          this is lossless as long as the template still covers them.
        * dtype drift (e.g. bf16 moments from before the f32-moment fix
          in train/optim.py): cast to the template dtype, logged — the
          resume is then no longer bit-identical, but is well-defined.

        Anything else (different tree structure, incompatible shapes)
        raises a clear error naming the offending leaf.
        """
        log.warning("strict restore failed (%s); attempting shape "
                    "migration", strict_err)
        raw = self._ckpt.restore(path)   # saved shapes/dtypes, no template

        def norm_path(kp):
            # orbax restores optax namedtuples/tuples as plain dicts, so
            # match template leaves to saved leaves by normalized key
            # path ('mu' == GetAttrKey('mu') == DictKey('mu'), '1' ==
            # SequenceKey(1) == DictKey('1')) instead of by treedef.
            parts = []
            for e in kp:
                for attr in ("key", "name", "idx"):
                    if hasattr(e, attr):
                        parts.append(str(getattr(e, attr)))
                        break
                else:
                    parts.append(str(e))
            return "/".join(parts)

        saved = {norm_path(kp): leaf for kp, leaf
                 in jax.tree_util.tree_leaves_with_path(raw)}
        t_items = jax.tree_util.tree_leaves_with_path(template)
        _, t_def = jax.tree_util.tree_flatten(template)
        out = []
        for kp, tl in t_items:
            name = norm_path(kp)
            if name not in saved:
                raise ValueError(
                    f"checkpoint {path} is missing leaf {name} (saved "
                    f"under an incompatible code version; saved leaves: "
                    f"{sorted(saved)[:20]}...). Strict error: {strict_err}")
            rl = np.asarray(saved[name])
            if rl.shape != tl.shape:
                trailing_ok = (rl.ndim == tl.ndim and rl.ndim >= 2
                               and rl.shape[1:] == tl.shape[1:])
                if not (trailing_ok and "embedding" in name):
                    raise ValueError(
                        f"checkpoint leaf {name}: saved shape {rl.shape} "
                        f"is incompatible with template {tl.shape} "
                        f"(only catalog-axis drift on embedding rows is "
                        f"migratable)")
                t_np = np.asarray(tl)
                if rl.shape[0] < tl.shape[0]:       # pad: template rows
                    mig = np.concatenate(
                        [rl, t_np[rl.shape[0]:].astype(rl.dtype)], axis=0)
                else:                                # slice down
                    mig = rl[:tl.shape[0]]
                log.warning("migrated %s rows %d -> %d", name,
                            rl.shape[0], tl.shape[0])
                rl = mig
            if rl.dtype != tl.dtype:
                log.warning("migrated %s dtype %s -> %s (resume is no "
                            "longer bit-identical)", name, rl.dtype,
                            tl.dtype)
                rl = rl.astype(tl.dtype)
            if isinstance(tl, jax.Array):
                rl = jax.device_put(rl, tl.sharding)
            out.append(rl)
        return jax.tree_util.tree_unflatten(t_def, out)
