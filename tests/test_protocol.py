"""One-command benchmark protocol (``dvd_tpu.cli.benchmark``): the
single-invocation replacement for the reference's run_sampling.py +
``matlab_code/run_benchmark.m:28-62`` workflow."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dvd_tpu.cli.benchmark import evaluate_predictions, pair_key


def test_pair_key_convention():
    # run_benchmark.m:36-40: pred 'warped_{k}_{m} copy.png' vs GT '{k}.png'
    assert pair_key("warped_12_2 copy.png") == (12, 2)
    assert pair_key("7.png") == (7, 0)
    assert pair_key("warped_img_3.png") == (3, 0)
    assert pair_key("nodigits.png") is None


def _doc_image(rng, h=90, w=70):
    """Text-like page: high-gradient strokes so AD's gradient weighting
    and the registration engines have structure to lock onto."""
    img = np.full((h, w, 3), 235, np.uint8)
    for y in range(8, h - 8, 9):
        x0 = 6 + int(rng.rand() * 8)
        x1 = w - 6 - int(rng.rand() * 8)
        img[y:y + 3, x0:x1] = (rng.rand(3) * 80).astype(np.uint8)
    return img


@pytest.fixture()
def pred_gt_dirs(tmp_path):
    rng = np.random.RandomState(0)
    gt_dir, pred_dir = tmp_path / "scan", tmp_path / "dewarped_pred"
    gt_dir.mkdir(), pred_dir.mkdir()
    for k in (1, 2):
        gt = _doc_image(rng)
        Image.fromarray(gt).save(gt_dir / f"{k}.png")
        for m in (1, 2):
            # identical prediction -> ms_ssim ~ 1, ld/ad ~ 0
            Image.fromarray(gt).save(pred_dir / f"warped_{k}_{m} copy.png")
    # unpaired prediction (no GT 9) must be skipped, not fail the run
    Image.fromarray(_doc_image(rng)).save(pred_dir / "warped_9_1 copy.png")
    return str(pred_dir), str(gt_dir)


def test_evaluate_predictions_identity(pred_gt_dirs):
    pred_dir, gt_dir = pred_gt_dirs
    summary = evaluate_predictions(pred_dir, gt_dir, area=None, workers=1)
    assert summary["count"] == 4 and summary["failed"] == 0
    assert summary["ms_ssim"] > 0.98
    assert summary["ld"] < 0.5 and summary["ad"] < 0.5

    # adres.txt: MATLAB save -ascii shape — (rows+mean, 5), loadable
    table = np.loadtxt(os.path.join(pred_dir, "adres.txt"))
    assert table.shape == (5, 5)
    np.testing.assert_allclose(table[-1], table[:-1].mean(0), atol=1e-6)
    assert list(table[0][:2]) == [1.0, 1.0]

    with open(os.path.join(pred_dir, "adres.json")) as f:
        js = json.load(f)
    assert js["count"] == 4 and len(js["rows"]) == 5


def test_failed_pair_gets_sentinel_row(pred_gt_dirs):
    pred_dir, gt_dir = pred_gt_dirs
    # corrupt one prediction -> its row must be [k, m, -1, -1, -1]
    # (run_benchmark.m:44-49 catch) and excluded from the mean
    bad = os.path.join(pred_dir, "warped_2_2 copy.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    summary = evaluate_predictions(pred_dir, gt_dir, area=None, workers=1)
    assert summary["count"] == 3 and summary["failed"] == 1
    table = np.loadtxt(os.path.join(pred_dir, "adres.txt"))
    sent = table[(table[:, 0] == 2) & (table[:, 1] == 2)][0]
    assert list(sent[2:]) == [-1.0, -1.0, -1.0]
    assert summary["ms_ssim"] > 0.98   # mean over valid rows only


@pytest.mark.slow
def test_protocol_end_to_end(tmp_path, monkeypatch):
    """dataset root -> sampling -> PNGs -> adres table, one call."""
    import dataclasses

    from dvd_tpu.cli import benchmark as B
    from dvd_tpu.config import default_config

    rng = np.random.RandomState(1)
    data_dir, gt_dir = tmp_path / "crop", tmp_path / "scan"
    data_dir.mkdir(), gt_dir.mkdir()
    for k in (1, 2):
        gt = _doc_image(rng, 128, 96)
        Image.fromarray(gt).save(gt_dir / f"{k}.png")
        for m in (1, 2):
            Image.fromarray(gt).save(data_dir / f"{k}_{m} copy.png")

    cfg = default_config().replace(
        model={"image_size": 16, "source_size": 128, "perception_size": 64,
               "compute_dtype": "float32"},
        diffusion={"n_batch": 2},
        data={"eval_dataset": str(data_dir), "eval_dataset_name": "synth",
              "eval_device_batch": 2},
    )
    cfg = dataclasses.replace(cfg, name="proto")
    monkeypatch.chdir(tmp_path)   # vis_hp/ lands under tmp
    summary = B.run(cfg, str(gt_dir), workers=1, area=None)
    assert summary["count"] == 4
    pred_dir = tmp_path / "vis_hp" / "synth" / "proto" / "dewarped_pred"
    assert (pred_dir / "adres.txt").exists()
    assert len(list(pred_dir.glob("warped_*.png"))) == 4
