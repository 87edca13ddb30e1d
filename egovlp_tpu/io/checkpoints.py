"""Orbax checkpointing.

TPU-native replacement for the reference's torch pickle checkpoints
(/root/reference/base/base_trainer.py:399-480): the same logical payload —
``{params, opt_state, epoch, monitor_best}`` — saved per save_period epochs
as ``checkpoint-epoch{N}`` plus a ``model_best`` copy on monitored-metric
improvement, with resume restoring epoch/monitor/optimizer.  Orbax gives
atomic async-safe multi-host writes instead of a single-process pickle.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, async_save: bool = False):
        """``async_save=True`` overlaps the Orbax write with subsequent
        training: ``save_epoch`` returns as soon as the device arrays are
        snapshotted and the serialization finishes in the background
        (Orbax writes to a temp dir and renames atomically, so a crash
        mid-write never corrupts a previous checkpoint).  ``wait()``
        blocks until all in-flight writes land; restore/overwrite paths
        synchronize automatically."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.async_save = async_save
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------
    def save_epoch(self, epoch: int, state: Dict[str, Any],
                   is_best: bool = False) -> Path:
        path = self.directory / f"checkpoint-epoch{epoch}"
        self._save(path, state)
        if is_best:
            self._save(self.directory / "model_best", state)
        return path

    def wait(self):
        """Block until all in-flight async saves have landed."""
        self._ckptr.wait_until_finished()

    def _save(self, path: Path, state: Dict[str, Any]):
        # serialize with any in-flight write BEFORE mutating the target
        # (model_best is overwritten every improvement)
        self._ckptr.wait_until_finished()
        # force=True delegates overwrite to Orbax: it barriers all processes
        # at save_start and rmtrees on the primary host only.  A manual
        # rmtree here raced under jax.distributed (every process deleting
        # the same shared-FS dir -> FileNotFoundError on the loser).
        self._ckptr.save(path, state, force=True)
        if not self.async_save:
            self._ckptr.wait_until_finished()

    # ------------------------------------------------------------------
    def restore(self, path: Optional[str] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Restore a checkpoint (default: latest epoch in the directory).
        ``template`` is an abstract pytree with the target structure."""
        self._ckptr.wait_until_finished()  # async saves must land first
        p = Path(path) if path else self.latest()
        if p is not None and p.resolve() == self.directory.resolve():
            # caller passed the manager directory itself -> use the latest
            # checkpoint inside it (or model_best if that's all there is)
            p = self.latest() or (
                self.directory / "model_best"
                if (self.directory / "model_best").exists() else None
            )
        if p is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if template is not None:
            template = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                              template)
            return self._ckptr.restore(p, template)
        return self._ckptr.restore(p)

    def latest(self) -> Optional[Path]:
        best = None
        best_epoch = -1
        for child in self.directory.glob("checkpoint-epoch*"):
            m = re.match(r"checkpoint-epoch(\d+)", child.name)
            if m and int(m.group(1)) > best_epoch:
                best_epoch = int(m.group(1))
                best = child
        return best
