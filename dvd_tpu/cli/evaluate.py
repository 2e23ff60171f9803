"""Offline metric evaluation over saved dewarped PNGs (the Python
replacement for the reference's MATLAB ``run_benchmark.m`` /
``run_docunet.m`` — no MATLAB or SIFTflow toolbox required).

Usage:
  python -m dvd_tpu.cli.evaluate \
      --pred vis_hp/docunet/exp1/dewarped_pred --gt /data/docunet/scan \
      --out results.json

Pairing follows the DocUNet convention (``run_benchmark.m:28-40``): the
leading integer of each prediction filename selects the GT scan
(``{k}.png`` in the GT directory); each scan has two photographed
crops ("k_1 copy", "k_2 copy").
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Optional


def leading_int(name: str) -> Optional[int]:
    m = re.search(r"(\d+)", name)
    return int(m.group(1)) if m else None


def main(argv=None):
    import numpy as np

    from dvd_tpu.evaluation import metrics as M

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--area", type=float, default=598400.0,
                    help="protocol resize area (run_docunet.m:14); 0 disables")
    a = ap.parse_args(argv)

    import cv2

    gt_index = {}
    for f in os.listdir(a.gt):
        k = leading_int(f)
        if k is not None:
            gt_index.setdefault(k, os.path.join(a.gt, f))

    rows = []
    for f in sorted(os.listdir(a.pred)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        k = leading_int(f)
        if k is None or k not in gt_index:
            print(f"skip {f}: no GT match")
            continue
        pred = cv2.imread(os.path.join(a.pred, f))[:, :, ::-1]
        gt = cv2.imread(gt_index[k])[:, :, ::-1]
        r = M.evaluate_pair(pred, gt, protocol_area=a.area or None)
        r["file"] = f
        rows.append(r)
        print(f"{f}: ms_ssim={r['ms_ssim']:.4f} ld={r['ld']:.3f} ad={r['ad']:.4f}")

    if not rows:
        raise SystemExit("no evaluable pairs found")
    summary = {
        "count": len(rows),
        "ms_ssim": float(np.mean([r["ms_ssim"] for r in rows])),
        "ld": float(np.mean([r["ld"] for r in rows])),
        "ad": float(np.mean([r["ad"] for r in rows])),
        "per_image": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "per_image"}))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
