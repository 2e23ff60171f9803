"""End-to-end training-driver smoke test: synthetic batches through
build_device_batch (frozen aux conditioning) + sharded train step +
checkpoint save, on the tiny config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.config import default_config
from dvd_tpu.training.train_loop import train
from dvd_tpu.utils.logger import KVLogger


def synthetic_batches(n, b=8, size=128):
    rng = np.random.RandomState(0)
    for _ in range(n):
        yield {
            "source_image": rng.rand(b, size, size, 3).astype(np.float32),
            "doc_mask": np.ones((b, size, size, 1), np.float32),
            "flow_map": (rng.rand(b, size, size, 2).astype(np.float32) - 0.5) * 8,
            "flow_map_inter": np.zeros((b, size, size, 2), np.float32),
        }


@pytest.mark.slow
def test_train_driver_e2e(tmp_path):
    cfg = default_config().replace(
        model={"image_size": 16, "source_size": 128, "perception_size": 64,
               "dit_variant": "DiT-S/8", "compute_dtype": "float32"},
        train={"log_interval": 2, "save_interval": 100},
        paths={"workspace_dir": str(tmp_path)},
    )
    # shrink the DiT via a monkeypatched pipeline after create (the driver
    # builds from cfg; DiT-S/8 at latent 16 -> 2x2 tokens, cheap)
    logger = KVLogger(str(tmp_path / "logs"), formats=("csv", "jsonl"))
    train(cfg, synthetic_batches(4), max_steps=3, logger=logger)

    ws = tmp_path / cfg.name
    ckpts = [d for d in os.listdir(ws) if d.startswith("state_")]
    assert ckpts, "final checkpoint missing"
    assert (tmp_path / "logs" / "progress.csv").exists()
