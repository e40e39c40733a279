"""Metrics sinks: tabular progress.csv + dual-file python logging.

Replaces rllab's tabular logger (headline metric
``real_current_validation_cost`` lands in ``progress.csv``, reference
``model_based_rl.py:1319``, ``README.md:20``) and the reference's
``get_logger`` dual file handler setup (``utils.py:298-315``).
"""

from __future__ import annotations

import csv
import logging
import os
import time
from typing import Any, Optional


class TabularLogger:
    """Accumulate key/value rows and dump them to progress.csv.

    The header grows as new keys appear (rewrites the file preserving rows),
    so late-appearing metrics don't crash the run.
    """

    def __init__(self, path: Optional[str] = None, resume: bool = False):
        self.path = path
        self._current: dict[str, Any] = {}
        self._rows: list[dict[str, Any]] = []
        self._header: list[str] = []
        # Resume continuity: on a `-resume`d run preload the existing rows
        # so the file keeps its history instead of being truncated on the
        # first header-growing dump (round-3 ant resume lost its round-2
        # rows from the live file this way).  A FRESH run that reuses a
        # snapshot_dir must NOT inherit the stale history (Itr numbering
        # would restart mid-file) — rotate the old file aside instead.
        if path is not None and os.path.isfile(path):
            if resume:
                try:
                    with open(path, newline="") as f:
                        r = csv.DictReader(f)
                        self._header = list(r.fieldnames or [])
                        self._rows = [dict(row) for row in r]
                except Exception:
                    self._header, self._rows = [], []
            else:
                n = 1
                while os.path.exists(f"{path}.old{n}"):
                    n += 1
                os.replace(path, f"{path}.old{n}")

    def record(self, key: str, value: Any):
        if hasattr(value, "item") and getattr(value, "ndim", 1) == 0:
            value = value.item()
        self._current[key] = value

    def dump(self):
        if not self._current:
            return
        row = dict(self._current)
        self._rows.append(row)
        self._current = {}
        new_keys = [k for k in row if k not in self._header]
        if self.path is not None:
            if new_keys:
                self._header.extend(new_keys)
                self._rewrite()
            else:
                self._append(row)

    def _rewrite(self):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._header, restval="")
            w.writeheader()
            for r in self._rows:
                w.writerow(r)

    def _append(self, row: dict):
        exists = os.path.exists(self.path)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._header, restval="")
            if not exists:
                w.writeheader()
            w.writerow(row)

    @property
    def rows(self) -> list[dict]:
        return list(self._rows)


def get_logger(name: str, folderpath: Optional[str] = None,
               level: int = logging.DEBUG) -> logging.Logger:
    """info.log (INFO) + debug.log (DEBUG, timestamped), like the reference."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if logger.handlers:  # idempotent
        return logger
    if folderpath is None:
        handler = logging.StreamHandler()
        handler.setLevel(logging.INFO)
        handler.setFormatter(logging.Formatter("%(levelname)s - %(message)s"))
        logger.addHandler(handler)
        return logger
    os.makedirs(folderpath, exist_ok=True)
    for logname, handler_level in [("info.log", logging.INFO), ("debug.log", logging.DEBUG)]:
        handler = logging.FileHandler(os.path.join(folderpath, logname))
        handler.setLevel(handler_level)
        if logname == "debug.log":
            fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
        else:
            fmt = logging.Formatter("%(levelname)s - %(message)s")
        handler.setFormatter(fmt)
        logger.addHandler(handler)
    return logger


class PhaseTimer:
    """Coarse per-phase wall-clock timers (collect_data_time, model_opt_time,
    policy_opt_time, ... — reference model_based_rl.py:590,616,694,731-733)."""

    def __init__(self):
        self._t0 = time.time()
        self._last = self._t0

    def lap(self) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        return dt

    def total(self) -> float:
        return time.time() - self._t0
