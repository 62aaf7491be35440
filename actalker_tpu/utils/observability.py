"""Structured logging, timing, and profiling helpers (the reference has only
wall-clock prints, ``Inference.py:320,361-362``; SURVEY.md flags this as a
gap to fill)."""
from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

_logger = None


def get_logger(name: str = "actalker_tpu") -> logging.Logger:
    global _logger
    if _logger is None:
        logger = logging.getLogger(name)
        if not logger.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s %(message)s"
            ))
            logger.addHandler(h)
        logger.setLevel(os.environ.get("ACTALKER_LOGLEVEL", "INFO"))
        _logger = logger
    return _logger


class MetricsEmitter:
    """Append-only JSONL metric sink (loss curves, step timings, eval)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None

    def emit(self, **fields: Any) -> Dict[str, Any]:
        fields.setdefault("ts", time.time())
        if self._fh:
            self._fh.write(json.dumps(fields) + "\n")
            self._fh.flush()
        else:
            get_logger().info("metric %s", fields)
        return fields


@contextlib.contextmanager
def phase_timer(name: str, emitter: Optional[MetricsEmitter] = None):
    """Wall-clock phase timing; logs (and optionally emits) on exit."""
    t0 = time.time()
    yield
    dt = time.time() - t0
    if emitter:
        emitter.emit(phase=name, seconds=dt)
    else:
        get_logger().info("phase %s took %.3fs", name, dt)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (works through the axon tunnel)."""
    import jax

    with jax.profiler.trace(logdir):
        yield


def seed_everything(seed: int) -> None:
    """Python/numpy seeding (JAX randomness is explicit-key)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
