"""ctypes bridge to the C++ collate fast path (native/collate.cc).

The reference's wall-clock bottleneck is per-example Python graph
construction in DataLoader workers (SURVEY.md §3.5; reference
collate.py:87-217).  Here the dense builders have a C++ implementation
compiled to ``libsrt_collate.so``; outputs are bit-identical to
``sessionrec_tpu.graph.builders`` (golden-tested in
tests/test_native_collate.py).  Falls back silently to numpy when the
library has not been built (``make -C native``).  The C calls release
the GIL, so the loader's prefetch thread overlaps fully with jit
dispatch.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATHS = [os.path.join(_REPO_ROOT, "native", "libsrt_collate.so")]

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_ppv = ctypes.POINTER(ctypes.c_void_p)


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
    lib.srt_build_session.restype = None
    lib.srt_build_session.argtypes = [
        _i32p, _i32p, ctypes.c_int, ctypes.c_int,
        _i32p, _f32p, _f32p, _i32p]
    lib.srt_build_lessr.restype = None
    lib.srt_build_lessr.argtypes = [
        _i32p, _i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _i32p, _f32p, _i32p, _f32p, _f32p, _i32p]
    lib.srt_build_ccs.restype = None
    lib.srt_build_ccs.argtypes = [
        _i32p, _i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _ppv, _ppv, _ppv, _ppv, _ppv, _ppv, _i32p]


def available() -> bool:
    return _load() is not None


def _flatten(seqs):
    offsets = np.zeros(len(seqs) + 1, dtype=np.int32)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.fromiter((x for s in seqs for x in s), dtype=np.int32,
                       count=int(offsets[-1]))
    return flat, offsets


def _ptr_array(arrs):
    return (ctypes.c_void_p * len(arrs))(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrs]) \
        if arrs else (ctypes.c_void_p * 1)()


def _labels_valid(seqs, labels, batch_size):
    labels_arr = np.zeros(batch_size, dtype=np.int32)
    labels_arr[:len(labels)] = labels
    valid = np.zeros(batch_size, dtype=np.float32)
    valid[:len(seqs)] = 1.0
    return labels_arr, valid


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
    labels_arr, valid = _labels_valid(seqs, labels, B)
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
    labels_arr, valid = _labels_valid(seqs, labels, B)
    return dict(node_iid=node_iid, node_mask=node_mask, mail_idx=mail_idx,
                mail_mask=mail_mask, sc_adj=sc_adj, last_idx=last_idx,
                labels=labels_arr, valid=valid)


def build_ccs_batch(seqs, labels, order, max_len, batch_size):
    lib = _load()
    flat, offsets = _flatten(seqs)
    B, K = batch_size, order
    caps = np.asarray([max(max_len - k + 1, 1) for k in range(1, K + 1)],
                      dtype=np.int32)
    levels = []
    for k in range(1, K + 1):
        Nk = int(caps[k - 1])
        levels.append(dict(
            iid=np.zeros((B, Nk, k), dtype=np.int32),
            mask=np.zeros((B, Nk), dtype=np.float32),
            intra_adj=np.zeros((B, Nk, Nk), dtype=np.float32),
            last_idx=np.zeros(B, dtype=np.int32)))
    inter_in = [np.zeros((B, int(caps[0]), int(caps[k - 1])),
                         dtype=np.float32) for k in range(2, K + 1)]
    inter_out = [np.zeros((B, int(caps[k - 1]), int(caps[0])),
                          dtype=np.float32) for k in range(2, K + 1)]
    lib.srt_build_ccs(
        flat, offsets, len(seqs), K, max_len,
        _ptr_array([lv["iid"] for lv in levels]),
        _ptr_array([lv["mask"] for lv in levels]),
        _ptr_array([lv["intra_adj"] for lv in levels]),
        _ptr_array([lv["last_idx"] for lv in levels]),
        _ptr_array(inter_in), _ptr_array(inter_out), caps)
    labels_arr, valid = _labels_valid(seqs, labels, B)
    return dict(levels=levels, inter_in=inter_in, inter_out=inter_out,
                labels=labels_arr, valid=valid)
