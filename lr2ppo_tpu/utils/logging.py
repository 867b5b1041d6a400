"""Logging: console + optional file (reference utils/logging.py:4-19),
plus a structured jsonl metric stream (the reference accumulated a
log_dict it never exported — we export)."""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


def init_logger(log_path: Optional[str] = None,
                name: str = "lr2ppo") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s",
                            "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_path:
        # pod: rank-0-only file handler (same shared-file interleaving
        # hazard as MetricLogger below; console stays on every rank)
        import jax

        if jax.process_index() == 0:
            os.makedirs(os.path.dirname(os.path.abspath(log_path)) or ".",
                        exist_ok=True)
            fh = logging.FileHandler(log_path)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricLogger:
    """Appends one JSON object per report to <path>; no-op without path."""

    def __init__(self, path: Optional[str] = None):
        if path:
            # pod: metrics are replicated, so every rank would append the
            # same records — interleaving one jsonl on shared storage.
            # Only rank 0 writes (reference is_master gating).
            import jax

            if jax.process_index() != 0:
                path = None
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                        exist_ok=True)

    def log(self, step: int, **metrics) -> None:
        if not self.path:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
