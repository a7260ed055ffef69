"""End-to-end training session: dataset -> loaders -> model -> runner.

Mirrors the reference entry scripts' wiring (main_msgifsr.py:128-188):
read dataset, optional tail valid-split, prefix-augmented loaders
(ordered train stream unless the preset shuffles), model, TrainRunner.
"""

from __future__ import annotations

import os

import jax


def _enable_compile_cache():
    """Persistent XLA compilation cache — the TPU eval/train step compiles
    are minutes-long through a remote-compile tunnel; cache them on disk."""
    cache_dir = os.environ.get("SESSIONREC_TPU_CACHE",
                               os.path.expanduser("~/.cache/sessionrec_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the flags
        pass


_enable_compile_cache()

from sessionrec_tpu.data.io import max_session_len, read_dataset
from sessionrec_tpu.data.loader import BatchLoader
from sessionrec_tpu.models import build_model
from sessionrec_tpu.train.runner import TrainRunner
from sessionrec_tpu.utils.logging import get_logger

log = get_logger(__name__)


def make_loaders(cfg, model_name=None, order=1, batch_slice=None):
    train_sessions, test_sessions, num_items = read_dataset(cfg.dataset_dir)
    if cfg.valid_split is not None:
        # tail split: last fraction of the (time-ordered) train stream
        # becomes the validation set (main_msgifsr.py:136-139)
        num_valid = int(len(train_sessions) * cfg.valid_split)
        test_sessions = train_sessions[-num_valid:]
        train_sessions = train_sessions[:-num_valid]
    max_len = cfg.max_len or max(max_session_len(train_sessions),
                                 max_session_len(test_sessions))
    if cfg.max_len is None and max_len > 50:
        # yoochoose stage-1 output is untruncated; a huge static node cap
        # makes the dense [B, N, N] graphs (and compile) explode
        log.warning(
            "longest session is %d items; consider --max-len 20 "
            "(prefixes keep their most recent items)", max_len)
    kind = {"srgnn": "session", "niser": "session", "lessr": "lessr",
            "msgifsr": "ccs"}[model_name]
    split_len = getattr(cfg, "split_len", None)
    if split_len and batch_slice is not None:
        # per-host sub-block caps would disagree with the global batch
        # layout (loader raises); multi-host runs use single-bucket
        # batches until the split layout is taught to slice per host
        log.warning("length-bucketed batches are not supported with "
                    "multi-host input slicing yet — disabling split_len")
        split_len = None
    train_loader = BatchLoader(
        train_sessions, kind, cfg.batch_size, max_len,
        shuffle=cfg.shuffle_train, order=order,
        prefetch=cfg.num_prefetch, use_native=cfg.use_native_collate,
        batch_slice=batch_slice, split_len=split_len)
    test_loader = BatchLoader(
        test_sessions, kind, cfg.batch_size, max_len, shuffle=False,
        order=order, prefetch=cfg.num_prefetch,
        use_native=cfg.use_native_collate, batch_slice=batch_slice,
        split_len=split_len)
    if train_loader.split is not None:
        log.info("length-bucketed batches: split_len=%s, tier caps "
                 "train=%s test=%s", train_loader.split[0],
                 train_loader.split[1], test_loader.split[1]
                 if test_loader.split else None)
    return train_loader, test_loader, num_items, max_len


def _make_mesh(cfg_train):
    """(data, model) mesh when dp*mp > 1, else None (single device)."""
    dp = int(getattr(cfg_train, "data_parallel", 1) or 1)
    mp = int(getattr(cfg_train, "model_parallel", 1) or 1)
    if dp * mp <= 1:
        return None
    if dp > 1 and mp == 1:
        # Measured (BENCH_NOTES r4, HLO byte counts): at mp=1 GSPMD emits
        # a full-table-size all-reduce for the gather-site embedding
        # gradients — ~2x the table wire of the mp=2 layout (43.6 MB vs
        # 24.4 MB per step at yoochoose-1/4 scale, dp=8).
        log.warning(
            "data_parallel=%d with model_parallel=1: the embedding "
            "gradient all-reduce moves ~2x the table bytes of an mp>=2 "
            "layout — prefer --model-parallel 2 on multi-chip runs "
            "(BENCH_NOTES.md round 4, mp=1 collective analysis)", dp)
    from sessionrec_tpu.parallel.mesh import make_mesh
    n = len(jax.devices())
    if dp * mp > n:
        raise ValueError(
            f"requested data_parallel={dp} x model_parallel={mp} "
            f"but only {n} devices are visible")
    return make_mesh(data=dp, model=mp, devices=jax.devices()[:dp * mp])


def run_training(cfg, max_epoch_batches=None):
    name = cfg.model.name.lower()

    multihost = jax.process_count() > 1
    if multihost and jax.process_index() != 0:
        # secondary processes stay quiet (primary-only observability)
        import logging
        logging.getLogger("sessionrec_tpu").setLevel(logging.WARNING)

    mesh = _make_mesh(cfg.train)
    batch_slice = None
    if mesh is not None and multihost:
        from sessionrec_tpu.parallel.multihost import local_batch_slice
        batch_slice = local_batch_slice(mesh, cfg.data.batch_size)
        log.info("multi-host: %d processes; this host builds batch rows "
                 "[%d, %d)", jax.process_count(), *batch_slice)

    train_loader, test_loader, num_items, max_len = make_loaders(
        cfg.data, model_name=name, order=cfg.model.order,
        batch_slice=batch_slice)
    log.info("dataset %s: %d train / %d test examples, %d items, max_len %d",
             cfg.data.dataset_dir, train_loader.num_examples,
             test_loader.num_examples, num_items, max_len)
    model = build_model(cfg.model, num_items)
    log.info("model %s on %s", name, jax.devices()[0].platform)

    if mesh is not None:
        log.info("mesh: %s over %d devices", dict(mesh.shape), mesh.size)

    checkpointer = None
    if cfg.train.checkpoint_dir:
        from sessionrec_tpu.utils.checkpoint import Checkpointer
        checkpointer = Checkpointer(cfg.train.checkpoint_dir)

    metrics = None
    if getattr(cfg.train, "metrics_file", None) and (
            not multihost or jax.process_index() == 0):
        from sessionrec_tpu.utils.metrics import MetricsLogger
        metrics = MetricsLogger(cfg.train.metrics_file)

    if max_epoch_batches is not None:
        train_loader = _CappedLoader(train_loader, max_epoch_batches)

    runner = TrainRunner(
        model, train_loader, test_loader,
        lr=cfg.train.lr, weight_decay=cfg.train.weight_decay,
        patience=cfg.train.patience, seed=cfg.train.seed,
        cutoff=cfg.train.cutoff, lr_step_size=cfg.train.lr_step_size,
        lr_gamma=cfg.train.lr_gamma,
        eval_before_train=cfg.train.eval_before_train,
        checkpointer=checkpointer,
        checkpoint_every=cfg.train.checkpoint_every_epochs,
        unroll=cfg.train.unroll,
        mesh=mesh, metrics=metrics)
    if checkpointer is not None and cfg.train.resume:
        checkpointer.restore_latest(runner)

    from sessionrec_tpu.utils.profiling import trace
    try:
        with trace(getattr(cfg.train, "profile_dir", None)):
            return runner.train(cfg.train.epochs, cfg.train.log_interval)
    finally:
        if metrics is not None:
            metrics.close()


class _CappedLoader:
    """Wraps a loader to yield at most N batches per epoch (smoke runs)."""

    def __init__(self, loader, cap):
        self.loader = loader
        self.cap = cap

    def __len__(self):
        return min(len(self.loader), self.cap)

    @property
    def num_examples(self):
        return self.loader.num_examples

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if i >= self.cap:
                return
            yield b
