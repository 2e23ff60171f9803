"""One-command benchmark protocol: dataset root -> dewarped PNGs ->
MS-SSIM/LD/AD table.

Replaces the reference's two-step workflow — ``run_sampling.py`` to
write ``vis_hp/.../dewarped_pred/warped_*.png``, then MATLAB
``matlab_code/run_benchmark.m:28-62`` over the pairing convention
(``{k}_{m} copy`` crops vs ``scan/{k}.png`` GTs) — with a single
invocation that drives sampling and metrics end to end.

Usage:
  python -m dvd_tpu.cli.benchmark \
      --dataset /data/docunet/crop --gt /data/docunet/scan \
      --name exp1 [--set model.checkpoint=weights.msgpack] [...]

Output (in the prediction directory, mirroring run_benchmark.m:62):
  * ``adres.txt``   — ASCII matrix, one row per (k, m) pair:
                      ``k  m  ad  ms_ssim  ld`` (failures as -1), with a
                      trailing row holding the mean over valid rows —
                      the exact shape MATLAB's ``save -ascii`` emits.
  * ``adres.json``  — the same data plus run stats, machine-readable.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import List, Optional, Tuple


def pair_key(name: str) -> Optional[Tuple[int, int]]:
    """(k, m) from a prediction filename.

    The reference reads ``warped_{k}_{m} copy.png`` against GT
    ``{k}.png`` (run_benchmark.m:36-40); we take the first integer as k
    and the second (if any) as m so plain ``{k}_{m}.png`` /
    ``warped_img_{k}.png`` layouts pair too.
    """
    ints = re.findall(r"\d+", name)
    if not ints:
        return None
    return int(ints[0]), int(ints[1]) if len(ints) > 1 else 0


def _metric_row(job):
    """Top-level for spawn-context pools.  Returns [k, m, ad, ms, ld]
    with -1 sentinels on failure (run_benchmark.m:44-49 catch block)."""
    pred_path, gt_path, k, m, area, backend = job
    try:
        import cv2

        from dvd_tpu.evaluation import metrics as M

        pred = cv2.imread(pred_path)
        gt = cv2.imread(gt_path)
        if pred is None or gt is None:
            raise IOError("unreadable image")
        r = M.evaluate_pair(pred[:, :, ::-1], gt[:, :, ::-1],
                            protocol_area=area, flow_backend=backend)
        return [float(k), float(m), r["ad"], r["ms_ssim"], r["ld"]]
    except Exception as e:  # noqa: BLE001 — parity with the parfor catch
        print(f"eval failed for {os.path.basename(pred_path)}: {e}")
        return [float(k), float(m), -1.0, -1.0, -1.0]


def evaluate_predictions(pred_dir: str, gt_dir: str, *,
                         area: Optional[float] = 598400.0,
                         workers: int = 8,
                         flow_backend: str = "auto") -> dict:
    """Score every prediction in ``pred_dir`` against ``gt_dir`` and
    write ``adres.txt`` / ``adres.json`` next to the predictions."""
    import numpy as np

    gt_index = {}
    for f in sorted(os.listdir(gt_dir)):
        key = pair_key(f)
        if key is not None:
            gt_index.setdefault(key[0], os.path.join(gt_dir, f))

    jobs = []
    for f in sorted(os.listdir(pred_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        key = pair_key(f)
        if key is None or key[0] not in gt_index:
            print(f"skip {f}: no GT with index {key and key[0]}")
            continue
        jobs.append((os.path.join(pred_dir, f), gt_index[key[0]],
                     key[0], key[1], area or None, flow_backend))
    if not jobs:
        raise SystemExit(f"no evaluable (pred, gt) pairs under {pred_dir}")

    if workers > 1 and len(jobs) > 1:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(min(workers, len(jobs))) as pool:
            rows = pool.map(_metric_row, jobs)
    else:
        rows = [_metric_row(j) for j in jobs]

    # run_benchmark.m:58 filters `res(:,3) > 0`; failures are tagged -1 so
    # >= 0 is the same predicate without dropping a perfect (ad == 0) pair
    res = np.asarray(sorted(rows), np.float64)
    valid = res[res[:, 2] >= 0]
    if len(valid) == 0:
        raise SystemExit("every pair failed evaluation")
    table = np.concatenate([res, valid.mean(0, keepdims=True)], 0)

    # run_benchmark.m:62 `save -ascii`: space-separated %.7e rows
    txt_path = os.path.join(pred_dir, "adres.txt")
    np.savetxt(txt_path, table, fmt="%.7e")
    summary = {
        "count": int(len(valid)),
        "failed": int(len(res) - len(valid)),
        "ms_ssim": float(valid[:, 3].mean()),
        "ld": float(valid[:, 4].mean()),
        "ad": float(valid[:, 2].mean()),
        "rows": [[float(v) for v in r] for r in table],
    }
    with open(os.path.join(pred_dir, "adres.json"), "w") as f:
        json.dump(summary, f, indent=2)

    print(f"{'k':>4} {'m':>2} {'ad':>8} {'ms_ssim':>8} {'ld':>8}")
    for r in table[:-1]:
        print(f"{int(r[0]):>4} {int(r[1]):>2} {r[2]:8.4f} {r[3]:8.4f} "
              f"{r[4]:8.3f}")
    print(f"mean ({len(valid)}/{len(res)} valid): "
          f"ad={summary['ad']:.4f} ms_ssim={summary['ms_ssim']:.4f} "
          f"ld={summary['ld']:.3f}")
    print(f"wrote {txt_path}")
    return summary


def run(cfg, gt_dir: str, *, seed: int = 42, workers: int = 8,
        area: Optional[float] = 598400.0, flow_backend: str = "auto"
        ) -> dict:
    """Sample the eval dataset under ``cfg`` then score the outputs."""
    import jax

    from dvd_tpu.evaluation.driver import run_from_config

    out_dir = os.path.join("vis_hp", cfg.data.eval_dataset_name, cfg.name)
    pred_dir = os.path.join(out_dir, "dewarped_pred")
    stats = run_from_config(cfg, rng=jax.random.PRNGKey(seed))
    print(f"sampling: {stats['images']} images at "
          f"{stats['imgs_per_sec']} imgs/sec")
    summary = evaluate_predictions(pred_dir, gt_dir, area=area,
                                   workers=workers,
                                   flow_backend=flow_backend)
    return summary


def main(argv=None):
    from run_sampling import parse_overrides

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True,
                    help="warped input images (e.g. docunet crop/)")
    ap.add_argument("--gt", required=True,
                    help="ground-truth scans (run_benchmark.m gtdir)")
    ap.add_argument("--name", default="benchmark")
    ap.add_argument("--eval_dataset_name", default="docunet")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--set", action="append", dest="overrides", metavar="K=V")
    ap.add_argument("--area", type=float, default=598400.0,
                    help="protocol resize area (run_docunet.m:14); 0 disables")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--flow_backend", default="auto",
                    choices=("auto", "native", "dis"))
    ap.add_argument("--skip_sampling", action="store_true",
                    help="--dataset is an existing prediction dir (e.g. "
                         "vis_hp/.../dewarped_pred); score it only")
    a = ap.parse_args(argv)

    if a.skip_sampling:
        evaluate_predictions(a.dataset, a.gt, area=a.area or None,
                             workers=a.workers,
                             flow_backend=a.flow_backend)
        return

    import dataclasses

    from dvd_tpu.config import default_config
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = default_config()
    over = parse_overrides(a.overrides)
    over.setdefault("data", {})["eval_dataset"] = a.dataset
    over["data"]["eval_dataset_name"] = a.eval_dataset_name
    if a.batch:
        over["data"]["eval_device_batch"] = a.batch
    cfg = dataclasses.replace(cfg.replace(**over), name=a.name)

    run(cfg, a.gt, seed=a.seed, workers=a.workers, area=a.area or None,
        flow_backend=a.flow_backend, skip_sampling=a.skip_sampling)


if __name__ == "__main__":
    main()
