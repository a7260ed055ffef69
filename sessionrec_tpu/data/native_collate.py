"""ctypes bridge to the C++ collate fast path (native/collate.cc).

The reference's wall-clock bottleneck is per-example Python graph
construction in DataLoader workers (SURVEY.md §3.5; collate.py:87-217).
Here the dense builders have a C++ implementation compiled to
``libsrt_collate.so``; outputs are bit-identical to
``sessionrec_tpu.graph.builders`` (golden-tested).  Falls back silently
to numpy when the library has not been built (``python -m
sessionrec_tpu.data.build_native`` or ``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libsrt_collate.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                _bind(lib)
                _LIB = lib
                break
            except OSError:
                pass
    return _LIB


def _bind(lib):
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.srt_build_session.restype = None
    lib.srt_build_session.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int,          # flat seqs, offsets, B, N
        i32p, f32p, f32p, i32p]                          # iid, mask, adj, last
    lib.srt_build_lessr.restype = None
    lib.srt_build_lessr.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, f32p, i32p, f32p, f32p, i32p]
    lib.srt_build_ccs.restype = None
    lib.srt_build_ccs.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p]


def available() -> bool:
    return _load() is not None


def _flatten(seqs):
    offsets = np.zeros(len(seqs) + 1, dtype=np.int32)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.fromiter((x for s in seqs for x in s), dtype=np.int32,
                       count=offsets[-1])
    return flat, offsets


def build_session_batch(seqs, labels, max_nodes, batch_size):
    lib = _load()
    flat, offsets = _flatten(seqs)
    B, N = batch_size, max_nodes
    node_iid = np.zeros((B, N), dtype=np.int32)
    node_mask = np.zeros((B, N), dtype=np.float32)
    adj = np.zeros((B, N, N), dtype=np.float32)
    last_idx = np.zeros(B, dtype=np.int32)
    lib.srt_build_session(flat, offsets, len(seqs), N,
                          node_iid, node_mask, adj, last_idx)
    labels_arr = np.zeros(B, dtype=np.int32)
    labels_arr[:len(labels)] = labels
    valid = np.zeros(B, dtype=np.float32)
    valid[:len(seqs)] = 1.0
    return dict(node_iid=node_iid, node_mask=node_mask, adj=adj,
                last_idx=last_idx, labels=labels_arr, valid=valid)


def build_lessr_batch(seqs, labels, max_nodes, batch_size, max_deg=None):
    lib = _load()
    flat, offsets = _flatten(seqs)
    B, N = batch_size, max_nodes
    D = max_deg if max_deg is not None else max(max_nodes - 1, 1)
    node_iid = np.zeros((B, N), dtype=np.int32)
    node_mask = np.zeros((B, N), dtype=np.float32)
    mail_idx = np.zeros((B, N, D), dtype=np.int32)
    mail_mask = np.zeros((B, N, D), dtype=np.float32)
    sc_adj = np.zeros((B, N, N), dtype=np.float32)
    last_idx = np.zeros(B, dtype=np.int32)
    lib.srt_build_lessr(flat, offsets, len(seqs), N, D,
                        node_iid, node_mask, mail_idx, mail_mask, sc_adj,
                        last_idx)
    labels_arr = np.zeros(B, dtype=np.int32)
    labels_arr[:len(labels)] = labels
    valid = np.zeros(B, dtype=np.float32)
    valid[:len(seqs)] = 1.0
    return dict(node_iid=node_iid, node_mask=node_mask, mail_idx=mail_idx,
                mail_mask=mail_mask, sc_adj=sc_adj, last_idx=last_idx,
                labels=labels_arr, valid=valid)


def build_ccs_batch(seqs, labels, order, max_len, batch_size):
    # CCS fast path not yet bound; use the numpy builder.
    from sessionrec_tpu.graph import builders
    return builders.build_ccs_batch(seqs, labels, order, max_len, batch_size)
