"""Structured logging (replaces the reference's bare print()s,
train.py:105-116)."""

from __future__ import annotations

import logging
import sys

_CONFIGURED = False


def get_logger(name="sessionrec_tpu"):
    global _CONFIGURED
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s",
            datefmt="%H:%M:%S"))
        root = logging.getLogger("sessionrec_tpu")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(name)
