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


_REDUCE_BUF = 16384  # JSON payload cap for the cross-host means gather


def multihost_weighted_means(means: Dict[str, tuple]) -> Dict[str, float]:
    """Count-weighted means of ``{key: (sum, count)}`` across every JAX
    process — the reference's ``mpi_weighted_mean`` (``logger.py:413-440``).

    Key sets may differ per host (quartile keys depend on each host's
    sampled timesteps), so the accumulator dicts ride a fixed-size JSON
    buffer through ``multihost_utils.process_allgather`` (the TPU-native
    replacement for MPI gather of Python objects).  Single-process: a
    plain local mean, no collective.  Must be called from all processes
    at the same point (it is a collective), exactly like the reference.
    """
    import jax

    if jax.process_count() == 1:
        return {k: s / n for k, (s, n) in means.items()}

    import numpy as np
    from jax.experimental import multihost_utils

    payload = json.dumps(means).encode()
    if len(payload) > _REDUCE_BUF:
        raise ValueError(f"metric payload {len(payload)} > {_REDUCE_BUF}")
    buf = np.zeros(_REDUCE_BUF, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    acc: Dict[str, list] = {}
    for row in gathered:
        row = bytes(row.tobytes()).rstrip(b"\x00")
        for k, (s, n) in json.loads(row.decode()).items():
            a = acc.setdefault(k, [0.0, 0])
            a[0] += s
            a[1] += n
    return {k: s / n for k, (s, n) in acc.items() if n}


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
        means = {k: (s, n) for k, (s, n) in self._means.items() if n}
        means = multihost_weighted_means(means)
        out = dict(self._vals)
        out.update(means)
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
        if not self._csv_keys and os.path.isfile(self._csv_path):
            # resumed process appending to an earlier run's file (e.g. a
            # --segment_steps child): adopt its header so the rewrite
            # below never drops columns the old rows already have
            with open(self._csv_path, newline="") as f:
                header = next(csv.reader(f), None)
            if header:
                self._csv_keys = list(header)
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
    """Per-timestep-quartile loss keys (reference ``train_util.py:680-688``):
    each *sample's* (t_i, v_i) pair contributes to ``{key}_q{4*t_i//T}``.
    ``losses`` values may be per-sample arrays (B,) or scalars (broadcast
    over ``t``)."""
    import numpy as np

    t = np.atleast_1d(np.asarray(t))
    for key, val in losses.items():
        v = np.broadcast_to(np.asarray(val, np.float64), t.shape)
        logger.logkv_mean(key, float(v.mean()))
        for ti, vi in zip(t, v):
            quartile = int(4 * ti / sched_steps)
            logger.logkv_mean(f"{key}_q{quartile}", float(vi))
