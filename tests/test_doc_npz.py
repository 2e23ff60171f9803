"""npz dataset family (dataset_name='doc_debug'/'aug_doc'): exact
load_gt_flow_npz numbers (reference utils_data/io.py:167-197), dataset
outputs, synthetic round-trip, and a train-step smoke per family."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dvd_tpu.data.doc_npz import (AugDocNpzDataset, DocNpzDataset,
                                  load_bm_npz, make_doc_sample_list,
                                  write_synthetic_doc_npz)
from dvd_tpu.data.doc3d import base_grid_abs


def test_load_bm_npz_exact_numbers(tmp_path):
    """Constant planes isolate the scalar transform: crop-to-447,
    *511 + 0.4, channel roll y->x (resize of a constant is exact)."""
    stored = np.zeros((448, 448, 2), np.float32)
    stored[..., 0] = 0.25      # y channel (stored y-first)
    stored[..., 1] = 0.75      # x channel
    # poison the 448th row/col: the loader must crop them away
    stored[447, :, :] = 99.0
    stored[:, 447, :] = 99.0
    p = tmp_path / "warped_BM.npz"
    np.savez_compressed(p, warped_BM=stored)

    bm = load_bm_npz(str(p))
    assert bm.shape == (512, 512, 2)
    np.testing.assert_allclose(bm[..., 0], 0.75 * 511.0 + 0.4, rtol=1e-6)
    np.testing.assert_allclose(bm[..., 1], 0.25 * 511.0 + 0.4, rtol=1e-6)


def test_load_bm_npz_matches_reference_recipe(tmp_path):
    """Non-constant field: byte-for-byte the reference's operation order
    (io.py:180-186) recomputed inline."""
    rng = np.random.RandomState(0)
    stored = rng.rand(448, 448, 2).astype(np.float32)
    p = tmp_path / "warped_BM.npz"
    np.savez_compressed(p, warped_BM=stored)

    ref = stored[:447, :447, :] * 511.0 + 0.4
    ref = np.stack([cv2.resize(ref[:, :, 0], (512, 512)),
                    cv2.resize(ref[:, :, 1], (512, 512))], axis=-1)
    ref = np.roll(ref, shift=1, axis=-1)
    np.testing.assert_array_equal(load_bm_npz(str(p)), ref)


@pytest.fixture(scope="module")
def npz_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("doc_npz")
    write_synthetic_doc_npz(str(root), 3, seed=7)
    return str(root)


def test_synthetic_roundtrip(npz_root):
    """write_synthetic_doc_npz stores the inverse transform: the loader
    must land on bm*(511/447) (448-frame coords scaled to the 512 frame)."""
    from dvd_tpu.data.synthetic import make_synthetic_sample

    samples = make_doc_sample_list(npz_root, split_ratio=1.0)
    assert len(samples) == 3
    _, bm448, _ = make_synthetic_sample(448, seed=7 * 100003 + 0)
    bm = load_bm_npz(samples[0][1])
    want = bm448 * (511.0 / 447.0)
    # compare away from the border (the 447->512 resize shifts samples)
    got_c = bm[64:448, 64:448]
    # map 512-frame pixel (i,j) back to the stored 447 grid for comparison
    idx = np.round(np.arange(64, 448) * 446.0 / 511.0).astype(int)
    want_c = want[np.ix_(idx, idx)]
    assert np.median(np.abs(got_c - want_c)) < 1.0


def test_basic_dataset_outputs(npz_root):
    ds = DocNpzDataset(samples=make_doc_sample_list(npz_root, split_ratio=1.0))
    out = ds[0]
    assert set(out) == {"source_image", "doc_mask", "flow_map",
                        "flow_map_inter"}
    assert out["source_image"].shape == (512, 512, 3)
    assert 0.0 <= out["source_image"].min() and out["source_image"].max() <= 1.0
    assert out["doc_mask"].shape == (512, 512, 1)
    # 0/1 in the interior; fractional only at the resize-interpolated edge
    # (the reference thresholds BEFORE its 512 resize too)
    assert 0.0 <= out["doc_mask"].min() and out["doc_mask"].max() <= 1.0
    assert (np.isin(out["doc_mask"], (0.0, 1.0)).mean()) > 0.9
    # flow = bm - base exactly
    bm = load_bm_npz(ds.samples[0][1])
    np.testing.assert_array_equal(out["flow_map"], bm - base_grid_abs(512))
    assert not out["flow_map_inter"].any()


def test_aug_dataset_outputs(npz_root):
    ds = AugDocNpzDataset(samples=make_doc_sample_list(npz_root,
                                                       split_ratio=1.0))
    a = ds.__getitem__(1, seed=123)
    b = ds.__getitem__(1, seed=123)
    c = ds.__getitem__(1, seed=124)
    for out in (a, b, c):
        assert out["source_image"].shape == (512, 512, 3)
        assert out["flow_map"].shape == (512, 512, 2)
        assert np.isfinite(out["flow_map"]).all()
    np.testing.assert_array_equal(a["source_image"], b["source_image"])
    assert not np.array_equal(a["source_image"], c["source_image"])


@pytest.mark.slow
@pytest.mark.parametrize("family", ["doc_debug", "aug_doc"])
def test_train_step_smoke_per_family(npz_root, family):
    """One real train step on batches produced by each npz dataset
    (downsized host-side to the tiny test geometry)."""
    import jax

    from dvd_tpu.config import default_config
    from dvd_tpu.training.train_loop import train
    from dvd_tpu.utils.logger import KVLogger

    ds = (DocNpzDataset if family == "doc_debug" else AugDocNpzDataset)(
        samples=make_doc_sample_list(npz_root, split_ratio=1.0))

    def batches(n, b=8, size=128):  # b divisible by the 8-device test mesh
        sc = size / 512.0
        for i in range(n):
            items = [ds.__getitem__(j % len(ds), seed=i * 10 + j)
                     for j in range(b)]
            yield {
                "source_image": np.stack([
                    cv2.resize(it["source_image"], (size, size))
                    for it in items]),
                "doc_mask": np.stack([
                    cv2.resize(it["doc_mask"], (size, size))[..., None]
                    for it in items]),
                "flow_map": np.stack([
                    cv2.resize(it["flow_map"] * sc, (size, size))
                    for it in items]),
                "flow_map_inter": np.stack([
                    cv2.resize(it["flow_map_inter"] * sc, (size, size))
                    for it in items]),
            }

    cfg = default_config().replace(
        model={"image_size": 16, "source_size": 128, "perception_size": 64,
               "dit_variant": "DiT-mini", "compute_dtype": "float32"},
        data={"dataset_name": family},
        train={"log_interval": 1, "save_interval": 100},
        paths={"workspace_dir": f"/tmp/npz_train_{family}"},
    )
    logger = KVLogger(None, formats=())
    train(cfg, batches(2), max_steps=1, logger=logger)
