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
    assert pair_key("07.png") == (7, 0)          # AnyPhotoDoc GT '%02d.png'
    assert pair_key("warped_img_3.png") == (3, 0)
    assert pair_key("nodigits.png") is None
    # run_docunet.m:41 / run_docreal.m:41 '{k}_{m} copy_rec.png' + the
    # commented alternates '{k}_{m}[_geo|_rec|_unwarp].png'
    assert pair_key("5_2 copy_rec.png") == (5, 2)
    assert pair_key("5_2_geo.png") == (5, 2)
    assert pair_key("5_2_unwarp.png") == (5, 2)
    # AnyPhotoDoc 5-int names (run.m:55, run_50.m/run_100.m '{x}_{a}_{b}_'
    # '{k}_{m}.jpg'): k/m are the 4th/5th integers, NOT the first two
    assert pair_key("6_1_2_14_2.jpg") == (14, 2)
    assert pair_key("warped_6_1_2_14_2.png") == (14, 2)
    assert pair_key("warped_6_1_2_14_2_geo.png") == (14, 2)
    # incidental leading digits (ADVICE r3): fall back to the LAST two ints
    assert pair_key("warped512_3_1.png") == (3, 1)
    assert pair_key("out_256px_step3_11_2.png") == (11, 2)


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


def test_main_skip_sampling(pred_gt_dirs, capsys):
    """Drive the real CLI surface (r3 shipped a TypeError in main() that
    run()-level tests missed)."""
    from dvd_tpu.cli.benchmark import main

    pred_dir, gt_dir = pred_gt_dirs
    main(["--dataset", pred_dir, "--gt", gt_dir, "--skip_sampling",
          "--workers", "1", "--area", "0"])
    assert os.path.exists(os.path.join(pred_dir, "adres.txt"))
    assert "mean" in capsys.readouterr().out


def test_main_sampling_branch_plumbing(tmp_path, monkeypatch):
    """main()'s sampling branch must bind run()'s signature — stub run()
    and check the config/kwargs it receives."""
    from dvd_tpu.cli import benchmark as B

    seen = {}
    monkeypatch.setattr(B, "run",
                        lambda cfg, gt, **kw: seen.update(cfg=cfg, gt=gt, **kw))
    B.main(["--dataset", str(tmp_path / "crop"), "--gt", str(tmp_path / "gt"),
            "--name", "x", "--batch", "2", "--workers", "1",
            "--set", "diffusion.n_batch=1"])
    assert seen["gt"] == str(tmp_path / "gt")
    assert seen["cfg"].data.eval_device_batch == 2
    assert seen["cfg"].diffusion.n_batch == 1
    assert seen["workers"] == 1 and "skip_sampling" not in seen

    # and the per-category dispatch binds run_categories' signature
    seen.clear()
    monkeypatch.setattr(B, "run_categories",
                        lambda cfg, ds, gt, **kw: seen.update(ds=ds, gt=gt, **kw))
    B.main(["--dataset", "d", "--gt", "g", "--per_category", "--workers", "1"])
    assert seen["ds"] == "d" and seen["gt"] == "g"


def test_evaluate_categories(tmp_path, capsys):
    """AnyPhotoDoc-style per-category protocol (run.m per-gtdir runs):
    matching category subdirs -> per-category means + overall table."""
    from dvd_tpu.cli.benchmark import evaluate_categories

    rng = np.random.RandomState(3)
    gt_root, pred_root = tmp_path / "gt", tmp_path / "pred"
    for cat, n in (("book", 2), ("two_column", 1)):
        (gt_root / cat).mkdir(parents=True)
        (pred_root / cat).mkdir(parents=True)
        for k in range(1, n + 1):
            gt = _doc_image(rng)
            Image.fromarray(gt).save(gt_root / cat / f"{k:02d}.png")
            # 5-int AnyPhotoDoc naming: x_a_b_k_m
            Image.fromarray(gt).save(pred_root / cat / f"6_1_2_{k}_1.png")
    report = evaluate_categories(str(pred_root), str(gt_root),
                                 area=None, workers=1)
    assert set(report["categories"]) == {"book", "two_column"}
    assert report["categories"]["book"]["count"] == 2
    assert report["overall"]["count"] == 3
    assert report["overall"]["ms_ssim"] > 0.98
    with open(pred_root / "adres_categories.json") as f:
        js = json.load(f)
    assert js["overall"]["count"] == 3
    # per-category adres.txt written inside each category dir
    assert (pred_root / "book" / "adres.txt").exists()
    out = capsys.readouterr().out
    assert "book" in out and "overall" in out


def test_pair_key_fallback_warns():
    # warnings (not print): pooled workers capture stdout (VERDICT r4 #7)
    with pytest.warns(UserWarning, match="fallback"):
        assert pair_key("warped512_3_1.png") == (3, 1)


def test_empty_category_does_not_abort(tmp_path, capsys):
    """One category with no evaluable pairs must not abort the rest
    (each category is a separate MATLAB invocation upstream)."""
    from dvd_tpu.cli.benchmark import evaluate_categories

    rng = np.random.RandomState(5)
    gt_root, pred_root = tmp_path / "gt", tmp_path / "pred"
    for cat in ("book", "empty_cat"):
        (gt_root / cat).mkdir(parents=True)
        (pred_root / cat).mkdir(parents=True)
    gt = _doc_image(rng)
    Image.fromarray(gt).save(gt_root / "book" / "01.png")
    Image.fromarray(gt).save(pred_root / "book" / "warped_1_1 copy.png")
    Image.fromarray(gt).save(gt_root / "empty_cat" / "01.png")
    report = evaluate_categories(str(pred_root), str(gt_root),
                                 area=None, workers=1)
    assert set(report["categories"]) == {"book"}
    assert "empty_cat failed" in capsys.readouterr().out


def test_nested_and_mixed_category_layouts(tmp_path):
    """--skip_sampling --per_category over a sampling run's output root:
    {root}/{cat}/dewarped_pred, including a flat category mixed in."""
    from dvd_tpu.cli.benchmark import main

    rng = np.random.RandomState(7)
    gt_root, pred_root = tmp_path / "gt", tmp_path / "pred"
    # nested category (driver layout)
    (gt_root / "book").mkdir(parents=True)
    (pred_root / "book" / "dewarped_pred").mkdir(parents=True)
    gt = _doc_image(rng)
    Image.fromarray(gt).save(gt_root / "book" / "01.png")
    Image.fromarray(gt).save(
        pred_root / "book" / "dewarped_pred" / "warped_1_1 copy.png")
    # flat category mixed into the same root
    (gt_root / "sparse_text").mkdir(parents=True)
    (pred_root / "sparse_text").mkdir(parents=True)
    gt2 = _doc_image(rng)
    Image.fromarray(gt2).save(gt_root / "sparse_text" / "01.png")
    Image.fromarray(gt2).save(
        pred_root / "sparse_text" / "warped_1_1 copy.png")

    main(["--dataset", str(pred_root), "--gt", str(gt_root),
          "--skip_sampling", "--per_category", "--workers", "1",
          "--area", "0"])
    with open(pred_root / "adres_categories.json") as f:
        js = json.load(f)
    assert set(js["categories"]) == {"book", "sparse_text"}
    assert js["overall"]["count"] == 2
    # per-category adres.txt written through the symlinks into the
    # real prediction dirs
    assert (pred_root / "book" / "dewarped_pred" / "adres.txt").exists()
    assert (pred_root / "sparse_text" / "adres.txt").exists()


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
