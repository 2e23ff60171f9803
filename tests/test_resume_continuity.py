"""Resume bit-continuity: train N steps -> save -> restore -> the next
steps' metrics must match an uninterrupted run bit-for-bit.

The reference's resume is load-bearing (train_util.py:148-204); this
proves ours is exact through the real driver path — ``train()``'s
latest-checkpoint discovery + orbax restore (train_loop.py:169-174) —
not a hand-rolled save/load.  Exactness holds because the step rng is
``fold_in(PRNGKey(seed), state.step)`` (train_state.py) and the whole
TrainState (params, opt state, EMA list, schedule-sampler history,
step) round-trips through orbax losslessly.
"""

import json
import os

import numpy as np
import pytest

from dvd_tpu.config import default_config
from dvd_tpu.training.train_loop import train
from dvd_tpu.utils.logger import KVLogger

pytestmark = pytest.mark.slow

B, SIZE = 8, 128
TIMING_KEYS = ("samples_per_sec",)


def make_batches(n):
    """Deterministic per-step batches so run A's step k sees exactly the
    data the resumed run's step k sees."""
    out = []
    for i in range(n):
        rng = np.random.RandomState(100 + i)
        out.append({
            "source_image": rng.rand(B, SIZE, SIZE, 3).astype(np.float32),
            "doc_mask": np.ones((B, SIZE, SIZE, 1), np.float32),
            "flow_map":
                (rng.rand(B, SIZE, SIZE, 2).astype(np.float32) - 0.5) * 8,
            "flow_map_inter": np.zeros((B, SIZE, SIZE, 2), np.float32),
        })
    return out


def tiny_cfg(ws):
    return default_config().replace(
        model={"image_size": 16, "source_size": 128, "perception_size": 64,
               "dit_variant": "DiT-S/8", "compute_dtype": "float32"},
        train={"log_interval": 1, "save_interval": 2,
               "schedule_sampler": "loss-second-moment"},
        paths={"workspace_dir": str(ws)},
    )


def read_rows(log_dir):
    rows = {}
    with open(os.path.join(log_dir, "progress.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            rows[int(r["step"])] = {
                k: v for k, v in r.items() if k not in TIMING_KEYS}
    return rows


def run(ws, log_dir, batches, max_steps):
    logger = KVLogger(str(log_dir), formats=("jsonl",))
    train(tiny_cfg(ws), iter(batches), max_steps=max_steps, logger=logger)


def test_resume_matches_uninterrupted(tmp_path):
    batches = make_batches(4)

    # A: 4 uninterrupted steps
    run(tmp_path / "A", tmp_path / "logA", batches, 4)
    rows_a = read_rows(tmp_path / "logA")

    # B: 2 steps, stop (final save lands at step 2), then resume for 2
    # more — the driver must find state_000002 itself and continue
    run(tmp_path / "B", tmp_path / "logB1", batches[:2], 2)
    ws_b = tmp_path / "B" / "default"
    assert any(d.startswith("state_") for d in os.listdir(ws_b))
    run(tmp_path / "B", tmp_path / "logB2", batches[2:], 4)
    rows_b = read_rows(tmp_path / "logB2")

    assert set(rows_b) == {2, 3}, f"resumed steps: {sorted(rows_b)}"
    for step in (2, 3):
        a, b = rows_a[step], rows_b[step]
        assert set(a) == set(b)
        for k in a:
            assert a[k] == b[k], \
                f"step {step} key {k}: {a[k]!r} != {b[k]!r} (not bit-exact)"
