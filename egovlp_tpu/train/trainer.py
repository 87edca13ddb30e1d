"""Epoch-loop trainer: monitoring, early stop, checkpoint save/resume.

Behavioral reference: /root/reference/base/base_trainer.py:313-480
(`Multi_BaseTrainer_dist`): per-epoch train + validation, monitored metric
with min/max mode, best-checkpoint tracking, early stop after
``early_stop`` non-improving epochs, ``init_val`` validation before the
first epoch, checkpoints every ``save_period`` epochs.

The task specifics live in two callables the recipe supplies:
``train_epoch_fn(state, epoch, logger) -> (state, log_dict)`` and
``valid_fn(state, epoch, logger) -> log_dict``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional

from egovlp_tpu.io.checkpoints import CheckpointManager
from egovlp_tpu.io.logging import MetricLogger, setup_logging


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 10
    save_period: int = 1
    monitor: str = "off"        # e.g. 'max Inter-video' / 'min loss_0'
    early_stop: int = 10
    init_val: bool = False
    save_dir: Optional[str] = None
    start_epoch: int = 1


class Trainer:
    def __init__(self, cfg: TrainerConfig,
                 train_epoch_fn: Callable,
                 valid_fn: Optional[Callable] = None,
                 ckpt: Optional[CheckpointManager] = None,
                 metric_logger: Optional[MetricLogger] = None):
        self.cfg = cfg
        self.train_epoch_fn = train_epoch_fn
        self.valid_fn = valid_fn
        self.ckpt = ckpt or (CheckpointManager(cfg.save_dir)
                             if cfg.save_dir else None)
        self.logger = setup_logging()
        self.metric_logger = metric_logger or MetricLogger(None, enabled=False)

        if cfg.monitor == "off":
            self.mnt_mode, self.mnt_metric = "off", None
            self.mnt_best = 0.0
        else:
            self.mnt_mode, self.mnt_metric = cfg.monitor.split(maxsplit=1)
            assert self.mnt_mode in ("min", "max")
            self.mnt_best = math.inf if self.mnt_mode == "min" else -math.inf

    # ------------------------------------------------------------------
    def _improved(self, log: Dict[str, Any]) -> bool:
        if self.mnt_mode == "off" or self.mnt_metric not in log:
            return False
        v = log[self.mnt_metric]
        if self.mnt_mode == "min":
            return v <= self.mnt_best
        return v >= self.mnt_best

    def train(self, state) -> Any:
        cfg = self.cfg
        not_improved = 0

        if cfg.init_val and self.valid_fn is not None:
            log = self.valid_fn(state, cfg.start_epoch - 1, self.metric_logger)
            self.logger.info("init_val: %s", log)
            if cfg.epochs < cfg.start_epoch:  # eval-only configs (epochs: 0)
                return state

        for epoch in range(cfg.start_epoch, cfg.epochs + 1):
            state, log = self.train_epoch_fn(state, epoch, self.metric_logger)
            if self.valid_fn is not None:
                log.update(self.valid_fn(state, epoch, self.metric_logger))

            for k, v in log.items():
                self.logger.info("  epoch %d: %s: %s", epoch, k, v)

            best = False
            if self.mnt_mode != "off":
                if self.mnt_metric not in log:
                    self.logger.warning(
                        "monitored metric %r not in log; disabling monitor",
                        self.mnt_metric,
                    )
                    self.mnt_mode = "off"
                elif self._improved(log):
                    self.mnt_best = log[self.mnt_metric]
                    not_improved = 0
                    best = True
                else:
                    not_improved += 1
                if not_improved > cfg.early_stop:
                    self.logger.info(
                        "no improvement for %d epochs; early stopping",
                        not_improved,
                    )
                    break

            if self.ckpt is not None and (
                epoch % cfg.save_period == 0 or best
            ):
                payload = {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": state.step,
                    "epoch": epoch,
                    "monitor_best": self.mnt_best,
                }
                self.ckpt.save_epoch(epoch, payload, is_best=best)
        if self.ckpt is not None:
            self.ckpt.wait()  # async saves must land before fit() returns
        return state
