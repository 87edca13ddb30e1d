"""Metrics logging: python logging + TensorBoard + JSONL.

Behavioral reference: /root/reference/logger/ (dictConfig console +
rotating info.log; tensorboardX writer tagged per mode with a
steps-per-second timer, logger/visualization.py:42-49).  The JSONL stream
is an addition: one machine-readable record per logged scalar group, which
the bench/driver tooling consumes.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import sys
import time
from pathlib import Path
from typing import Dict, Optional


def setup_logging(save_dir: Optional[str] = None,
                  level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger("egovlp_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_dir:
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            Path(save_dir) / "info.log", maxBytes=10 * 1024 ** 2, backupCount=20
        )
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricLogger:
    """Scalar logging to TensorBoard (if available) + JSONL."""

    def __init__(self, log_dir: Optional[str] = None, enabled: bool = True):
        self.enabled = enabled and log_dir is not None
        self._tb = None
        self._jsonl = None
        self._step = 0
        self._mode = ""
        self._t0 = None
        if self.enabled:
            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self._jsonl = open(Path(log_dir) / "metrics.jsonl", "a")
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def set_step(self, step: int, mode: str = "train"):
        self._step = step
        self._mode = mode
        now = time.time()
        if self._t0 is not None and step > 0:
            self.scalar("steps_per_sec", 1.0 / max(now - self._t0, 1e-9))
        self._t0 = now

    def scalar(self, name: str, value: float, step: Optional[int] = None):
        if not self.enabled:
            return
        step = self._step if step is None else step
        tag = f"{self._mode}/{name}" if self._mode else name
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        self._jsonl.write(json.dumps(
            {"step": step, "tag": tag, "value": float(value),
             "ts": time.time()}) + "\n")
        self._jsonl.flush()

    def scalars(self, values: Dict[str, float], step: Optional[int] = None):
        for k, v in values.items():
            self.scalar(k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


class Profiler:
    """jax.profiler wrapper: capture a trace for chosen steps.

    The reference has no profiling at all (SURVEY.md §5); on TPU a
    first-class trace is the difference between guessing and knowing —
    usage: ``prof = Profiler(log_dir, start=10, stop=13)`` then call
    ``prof.step(i)`` once per training step.
    """

    def __init__(self, log_dir: Optional[str], start: int = -1,
                 stop: int = -1):
        self.log_dir = log_dir
        self.start_step = start
        self.stop_step = stop
        self._active = False

    def step(self, step: int):
        if self.log_dir is None or self.start_step < 0:
            return
        import jax

        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
