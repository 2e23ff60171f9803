"""On-device augmentation (``data/device_aug.py``): the jitted warp +
jitter must match the host dataset path (``data/doc3d.py``) at equal
random factors, and the train driver must run on the raw-batch contract.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from dvd_tpu.data import device_aug as DA
from dvd_tpu.data.doc3d import base_grid_abs, bilinear_warp_np


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    rgb = rng.rand(33, 17, 3).astype(np.float32)
    back = np.asarray(DA.hsv_to_rgb(DA.rgb_to_hsv(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_jitter_matches_host_formulas():
    """apply_color_jitter vs the host op formulas (doc3d.color_jitter's
    brightness/contrast/saturation math + cv2 HSV hue rotation) at equal
    per-sample factors and equal (fixed) op order."""
    rng = np.random.RandomState(1)
    img = rng.rand(1, 48, 40, 3).astype(np.float32)
    b, c, s, h = 1.07, 0.93, 1.05, 0.06

    out = np.asarray(DA.apply_color_jitter(
        jnp.asarray(img), *(jnp.full((1,), v, jnp.float32)
                            for v in (b, c, s, h))))[0]

    ref = img[0] * b
    mean = ref.mean(axis=(0, 1), keepdims=True).mean()
    ref = (ref - mean) * c + mean
    gray = ref @ np.array([0.299, 0.587, 0.114], np.float32)
    ref = ref * s + gray[..., None] * (1 - s)
    hsv = cv2.cvtColor(np.clip(ref, 0, 1).astype(np.float32),
                       cv2.COLOR_RGB2HSV)
    hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
    ref = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)

    np.testing.assert_allclose(out, ref, atol=2e-3)


@pytest.mark.parametrize("frac", [0.0, 0.35])
def test_warp_matches_host(frac):
    """augment_batch's normalized-grid warp vs the host's cv2.remap on
    the same absolute bm (away from the zero-padded border)."""
    size = 64
    rng = np.random.RandomState(2)
    img = (rng.rand(size, size, 3) * 255).astype(np.float32)
    mask = (rng.rand(size, size, 1) > 0.2).astype(np.float32)
    base = base_grid_abs(size)
    flow = np.stack([
        3.0 * np.sin(np.linspace(0, 3, size))[None, :].repeat(size, 0),
        2.0 * np.cos(np.linspace(0, 2, size))[:, None].repeat(size, 1),
    ], -1).astype(np.float32)

    out = DA.augment_batch(
        {"image512": jnp.asarray(img)[None],
         "doc_mask512": jnp.asarray(mask)[None],
         "flow_map": jnp.asarray(flow)[None]},
        jax.random.PRNGKey(0), inter_frac=frac, jitter=False)

    bm_inter = base + frac * flow
    ref_src = bilinear_warp_np(img, bm_inter) / 255.0
    ref_msk = bilinear_warp_np(mask, bm_inter)

    sl = np.s_[6:-6, 6:-6]
    np.testing.assert_allclose(np.asarray(out["source_image"])[0][sl],
                               ref_src[sl], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["doc_mask"])[0, 6:-6, 6:-6, 0],
                               ref_msk[sl], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["flow_map_inter"])[0],
                               frac * flow, atol=1e-6)


def test_dataset_device_aug_contract(tmp_path):
    """Doc3DDataset(device_aug=True) ships the raw keys augment_batch
    consumes, and augment_batch completes the host contract."""
    from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
    from dvd_tpu.data.synthetic import write_synthetic_doc3d

    root = write_synthetic_doc3d(str(tmp_path), n=2, seed=5)
    ds = Doc3DDataset(samples=make_doc3d_sample_list(root, split_ratio=1.0),
                      device_aug=True)
    item = ds.__getitem__(0, seed=11)
    assert set(item) == {"image512", "doc_mask512", "flow_map"}
    assert item["image512"].shape == (512, 512, 3)
    assert item["image512"].max() > 1.5          # [0,255] scale
    assert 0.0 <= item["doc_mask512"].min() <= item["doc_mask512"].max() <= 1.0

    batch = DA.augment_batch(
        {k: jnp.asarray(v)[None] for k, v in item.items()},
        jax.random.PRNGKey(1), inter_frac=0.0)
    assert set(batch) == {"source_image", "doc_mask", "flow_map",
                          "flow_map_inter"}
    s = np.asarray(batch["source_image"])
    assert np.isfinite(s).all() and 0.0 <= s.min() and s.max() <= 1.0


@pytest.mark.slow
def test_train_step_with_device_aug(tmp_path):
    """One driver step on the raw-batch contract with on_device_aug."""
    from dvd_tpu.config import default_config
    from dvd_tpu.training.train_loop import train
    from dvd_tpu.utils.logger import KVLogger

    B, SIZE = 8, 128
    rng = np.random.RandomState(3)

    def batches(n):
        for _ in range(n):
            yield {
                "image512":
                    (rng.rand(B, SIZE, SIZE, 3) * 255).astype(np.float32),
                "doc_mask512": np.ones((B, SIZE, SIZE, 1), np.float32),
                "flow_map":
                    (rng.rand(B, SIZE, SIZE, 2).astype(np.float32) - .5) * 8,
            }

    cfg = default_config().replace(
        model={"image_size": 16, "source_size": 128, "perception_size": 64,
               "dit_variant": "DiT-S/8", "compute_dtype": "float32"},
        train={"log_interval": 1, "save_interval": 100,
               "on_device_aug": True},
        data={"inter_t": 7},
        paths={"workspace_dir": str(tmp_path)},
    )
    logger = KVLogger(str(tmp_path / "logs"), formats=("jsonl",))
    train(cfg, batches(2), max_steps=2, logger=logger)
    import json

    with open(tmp_path / "logs" / "progress.jsonl") as f:
        rows = [json.loads(l) for l in f]
    assert rows and np.isfinite(rows[-1]["grad_norm"])


def test_device_resident_iterator(tmp_path):
    """run_training.device_resident_iterator: stages the raw device-aug
    sample set once and yields on-device gather batches with the same
    keys/dtypes/value ranges as the host loader path."""
    import run_training as RT

    from dvd_tpu.config import default_config
    from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
    from dvd_tpu.data.synthetic import write_synthetic_doc3d

    root = str(tmp_path / "syn")
    write_synthetic_doc3d(root, 6, seed=5)
    ds = Doc3DDataset(samples=make_doc3d_sample_list(root, split_ratio=1.0),
                      device_aug=True)
    cfg = default_config().replace(train={"batch_size": 4})
    assert RT._device_dataset_ok(cfg, ds)
    it = RT.device_resident_iterator(cfg, ds, seed=1)
    b1 = next(it)
    b2 = next(it)
    assert set(b1) == {"image512", "doc_mask512", "flow_map"}
    img = np.asarray(b1["image512"])
    assert img.shape == (4, 512, 512, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 255.0
    # epoch reshuffle: second batch draws different indices (6 samples,
    # batch 4 -> epoch boundary forces a fresh permutation)
    assert np.asarray(b2["flow_map"]).shape == (4, 512, 512, 2)

    # gate: oversized dataset rejected when forced on
    cfg_on = default_config().replace(
        train={"device_dataset": "on", "device_dataset_max_gb": 1e-6})
    with pytest.raises(ValueError):
        RT._device_dataset_ok(cfg_on, ds)
