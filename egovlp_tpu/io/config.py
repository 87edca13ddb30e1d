"""JSON task configuration.

Schema-compatible with the reference configs (/root/reference/configs/*,
parsed by parse_config.py): ``{name, n_gpu, arch, data_loader, optimizer,
loss, metrics, trainer, visualizer}``.  Unlike the reference's reflective
``initialize()`` factory (parse_config.py:88-113), construction here is
explicit — each recipe reads the typed sections it needs; unknown keys are
preserved and accessible.

Run directories follow the reference layout: ``{save_dir}/{models,log,tf}/
{name}/{timestamp}`` (parse_config.py:50-64).
"""

from __future__ import annotations

import copy
import datetime
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional


class Config(dict):
    """Dict with attribute-ish helpers and dotted-path overrides."""

    def override(self, dotted: str, value: Any) -> "Config":
        """Set ``a.b.c = value`` (CLI override semantics,
        parse_config.py:144-166)."""
        keys = dotted.split(".")
        node = self
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
        return self

    def get_path(self, dotted: str, default=None):
        node = self
        for k in dotted.split("."):
            if not isinstance(node, dict) or k not in node:
                return default
            node = node[k]
        return node

    def clone(self) -> "Config":
        return Config(copy.deepcopy(dict(self)))

    # ------------------------------------------------------------------
    def make_run_dirs(self, timestamp: Optional[str] = None) -> Dict[str, Path]:
        save_dir = Path(self.get_path("trainer.save_dir", "results"))
        name = self.get("name", "run")
        ts = timestamp or datetime.datetime.now().strftime("%m%d_%H%M%S")
        dirs = {
            "models": save_dir / "models" / name / ts,
            "log": save_dir / "log" / name / ts,
            "tf": save_dir / "tf" / name / ts,
        }
        for d in dirs.values():
            d.mkdir(parents=True, exist_ok=True)
        with open(dirs["models"] / "config.json", "w") as f:
            json.dump(dict(self), f, indent=2, default=str)
        return dirs


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    with open(os.path.expandvars(path)) as f:
        cfg = Config(json.load(f))
    for k, v in (overrides or {}).items():
        cfg.override(k, v)
    return cfg
