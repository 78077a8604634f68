"""Scalar metrics logging: the TensorBoard-equivalent for training runs.

Reference: dm_control/scripts/rl/ppo/ppo.py:119-160 logs train/eval/time
scalar groups to a TensorBoard SummaryWriter.  Here scalars go to a
newline-delimited JSON file (one object per flush: step, wall-clock, and
the scalar dict) — greppable, plotting-tool-agnostic, and safe to write
from jitted training loops (values are pulled to host at flush time).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    """Appends scalar rows to a .jsonl file (and optionally stdout)."""

    def __init__(self, logdir: str, filename: str = "metrics.jsonl",
                 echo: bool = False):
        os.makedirs(logdir, exist_ok=True)
        self._path = os.path.join(logdir, filename)
        self._file = open(self._path, "a", buffering=1)
        self._echo = echo
        self._t0 = time.time()

    @property
    def path(self) -> str:
        return self._path

    def write(self, step: int, scalars: Dict[str, float],
              group: Optional[str] = None) -> None:
        row = {"step": int(step),
               "wall_s": round(time.time() - self._t0, 3)}
        prefix = f"{group}/" if group else ""
        for k, v in scalars.items():
            row[prefix + k] = float(v)
        self._file.write(json.dumps(row) + "\n")
        if self._echo:
            print(" ".join(f"{k}={v}" for k, v in row.items()))

    def close(self) -> None:
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(path: str):
    """Loads a metrics.jsonl file back as a list of dicts."""
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
