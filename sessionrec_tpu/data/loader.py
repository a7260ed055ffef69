"""Host input pipeline: ordered/shuffled batching + background prefetch.

Replaces the reference's torch DataLoader with multiprocess workers
(reference: src/scripts/main_msgifsr.py:148-166).  Graph building happens
on host CPU in a background thread (double-buffered), overlapping with
the TPU step; batches are fixed-shape so the compiled step never
recompiles.  Train order is *sequential* by default to reproduce the
reference's ordered-training semantics (README.md:37); NISER shuffles
(main_niser.py:84-92).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from sessionrec_tpu.data.augment import AugmentedIndex
from sessionrec_tpu.graph import batch as B
from sessionrec_tpu.graph import builders

try:  # optional C++ fast-path builders (native/collate.cc)
    from sessionrec_tpu.data import native_collate as _native
except Exception:  # pragma: no cover
    _native = None


def _make_batch(kind, seqs, labels, max_len, batch_size, order, use_native=True):
    bl = _native if (use_native and _native is not None and _native.available()) \
        else builders
    if kind == "session":
        d = bl.build_session_batch(seqs, labels, max_len, batch_size)
        return B.SessionGraphBatch(**d)
    if kind == "lessr":
        d = bl.build_lessr_batch(seqs, labels, max_len, batch_size)
        return B.LessrBatch(**d)
    if kind == "ccs":
        d = bl.build_ccs_batch(seqs, labels, order, max_len, batch_size)
        levels = tuple(B.CcsLevel(**lv) for lv in d["levels"])
        return B.CcsBatch(levels=levels, inter_in=tuple(d["inter_in"]),
                          inter_out=tuple(d["inter_out"]),
                          labels=d["labels"], valid=d["valid"])
    raise ValueError(f"unknown batch kind {kind!r}")


class BatchLoader:
    """Iterable over fixed-shape graph batches.

    Args:
      sessions: list of item-id sequences.
      kind: 'session' (SRGNN/NISER), 'lessr', or 'ccs' (MSGIFSR).
      batch_size: static batch size; the final partial batch is padded
        with ``valid=0`` rows (the reference instead emits a ragged last
        batch — metrics are identical because padded rows are masked).
      max_len: static per-session node cap (sessions are <= 20 items
        after preprocessing; computed from data by the CLI).
      shuffle: shuffle example order each epoch (NISER) or keep the
        time-ordered stream (SRGNN default off in scripts, LESSR/MSGIFSR).
      order: CCS order (MSGIFSR only).
      seed: shuffle seed.
      prefetch: number of batches built ahead in a background thread.
      batch_slice: multi-host — (start, stop) rows of each *global* batch
        this process materialises (parallel/multihost.py
        ``local_batch_slice``).  The epoch order stays the global stream;
        only the built slice is local, so global time-order semantics are
        preserved across data-parallel hosts (README.md:37).
      split_len: length-bucketed batches — an int or an ascending list
        of ints.  Each threshold adds a tier: examples with prefix
        length <= the first threshold build at that (smaller) static
        node cap, lengths in the next (lo, hi] range at the next cap,
        and so on, the rest at ``max_len``; each yielded batch is a
        (nested, for >1 threshold) ``graph.batch.SplitBatch`` holding
        the SAME example set as the unsplit batch.  Tier row caps are
        computed exactly from the deterministic epoch orders
        (``_split_caps``).  None/0/empty disables; incompatible with
        ``batch_slice`` (raises).
    """

    def __init__(self, sessions, kind, batch_size, max_len, shuffle=False,
                 order=1, seed=0, prefetch=2, drop_last=False,
                 use_native=True, batch_slice=None, split_len=None):
        self.index = AugmentedIndex(sessions)
        self.kind = kind
        self.batch_size = batch_size
        self.max_len = max_len
        self.shuffle = shuffle
        self.order = order
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.use_native = use_native
        self.seed = seed
        self.epoch = 0
        self.batch_slice = batch_slice
        self.split = None
        if split_len is not None:
            ts = (split_len,) if np.isscalar(split_len) else tuple(split_len)
            thresholds = tuple(sorted({int(t) for t in ts
                                       if 0 < int(t) < max_len}))
            if thresholds:
                if batch_slice is not None:
                    raise ValueError(
                        "split_len bucketing is not supported together "
                        "with multi-host batch_slice (per-host sub-block "
                        "caps would disagree with the global batch layout)")
                self.split = (thresholds,
                              self._split_caps(thresholds))

    # Epochs whose shuffle orders are scanned when sizing the split
    # sub-blocks.  Orders are a pure function of (seed, epoch)
    # (set_epoch), so the caps are EXACT for any run of up to this many
    # epochs (the reference default is 30); ordered streams reuse one
    # order, so their caps are exact for any length of run.
    _SPLIT_CAP_EPOCHS = 64

    def _split_caps(self, thresholds):
        """Static per-tier row caps (one per threshold + the final
        ``max_len`` tier).

        Scans the actual epoch orders this loader will produce and takes
        the exact per-batch maxima of each tier's row count (lengths
        after the max_len truncation), rounded up for shardability.
        Measured motivation in graph/batch.py:SplitBatch.
        """
        lens = np.minimum(self.index.index[:, 1], self.max_len) \
            if len(self.index) else np.empty(0, np.int64)
        B = self.batch_size
        n = len(lens)
        nb = (n + B - 1) // B
        bounds = list(thresholds) + [self.max_len]
        lows = [0] + list(thresholds)
        maxes = [0] * len(bounds)
        for epoch in range(self._SPLIT_CAP_EPOCHS if self.shuffle else 1):
            order = np.arange(n)
            if self.shuffle:
                np.random.default_rng((self.seed, epoch)).shuffle(order)
            lp = np.full(nb * B, -1, dtype=np.int64)
            lp[:n] = lens[order]
            lp = lp.reshape(nb, B)
            if not nb:
                continue
            for gi, (lo, hi) in enumerate(zip(lows, bounds)):
                ng = ((lp > lo) & (lp <= hi)).sum(axis=1) if gi \
                    else ((lp >= 0) & (lp <= hi)).sum(axis=1)
                maxes[gi] = max(maxes[gi], int(ng.max()))
        # round up so the batch axis stays shardable over a data axis
        # (any dp dividing the multiple; chunk_sharding shards axis 1)
        mult = 32 if B % 32 == 0 else (8 if B % 8 == 0 else 1)

        def cap(x):
            return max(min(-(-x // mult) * mult, B), mult)
        return tuple(cap(x) for x in maxes)

    def set_epoch(self, epoch: int):
        """Pin the shuffle stream to an epoch (deterministic resume: the
        order of epoch k is a pure function of (seed, k), so a resumed
        run replays exactly the stream an uninterrupted run would see)."""
        self.epoch = int(epoch)

    def __len__(self):
        n = len(self.index)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_examples(self):
        return len(self.index)

    def _epoch_order(self):
        order = np.arange(len(self.index))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        self.epoch += 1
        return order

    def _build(self, ids):
        local_size = self.batch_size
        if self.batch_slice is not None:
            start, stop = self.batch_slice
            ids = ids[start:stop]
            local_size = stop - start
        seqs, labels = [], []
        max_len = self.max_len
        for i in ids:
            s, l = self.index.example(i)
            # Prefixes longer than the static node cap keep their most
            # recent max_len items (yoochoose stage-1 emits untruncated
            # sessions; the common pipelines pre-truncate to 20 so this
            # is a no-op there).
            if len(s) > max_len:
                s = s[-max_len:]
            seqs.append(s)
            labels.append(l)
        if self.split is not None:
            return self._build_split(seqs, labels)
        return _make_batch(self.kind, seqs, labels, self.max_len,
                           local_size, self.order, self.use_native)

    def _build_split(self, seqs, labels):
        """Partition one batch's examples by prefix length into the
        statically-capped tiers (graph/batch.py:SplitBatch, nested for
        3+ tiers).  The example set is exactly the unsplit batch's; only
        row order within the batch permutes (shortest tier first), which
        nothing downstream depends on."""
        thresholds, caps = self.split
        bounds = list(thresholds) + [self.max_len]
        groups = [([], []) for _ in bounds]
        for s, l in zip(seqs, labels):
            for gi, hi in enumerate(bounds):
                if len(s) <= hi:
                    groups[gi][0].append(s)
                    groups[gi][1].append(l)
                    break
        for (gs, _), cap, hi in zip(groups, caps, bounds):
            if len(gs) > cap:
                raise RuntimeError(
                    f"split tier overflow: batch has {len(gs)} rows of "
                    f"length <= {hi} vs cap {cap} — a shuffled run "
                    f"exceeded the {self._SPLIT_CAP_EPOCHS} epochs the "
                    f"caps were sized for; raise "
                    f"BatchLoader._SPLIT_CAP_EPOCHS or disable split_len")
        from sessionrec_tpu.graph.batch import nest_blocks
        return nest_blocks([
            _make_batch(self.kind, gs, gl, hi, cap, self.order,
                        self.use_native)
            for (gs, gl), cap, hi in zip(groups, caps, bounds)])

    def __iter__(self):
        order = self._epoch_order()
        nb = len(self) if not self.drop_last else len(self.index) // self.batch_size
        if self.prefetch <= 0:
            for k in range(nb):
                yield self._build(order[k * self.batch_size:(k + 1) * self.batch_size])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for k in range(nb):
                    if stop.is_set():
                        return
                    q.put(self._build(
                        order[k * self.batch_size:(k + 1) * self.batch_size]))
                q.put(None)
            except BaseException as e:  # surface builder errors to consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
