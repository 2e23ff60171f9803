#!/usr/bin/env python
"""High-resolution (DIR300-shaped) serving profile (VERDICT r4 item 5).

BASELINE.json config #3 names native-size unwarp at DIR300 resolutions
(~2000px originals) as a first-class serving target; the reference's hot
path is ``train_settings/dvd/evaluation.py:300-318`` (flow upsampled to
the original size, then a full-resolution grid_sample).  This tool
measures, on the real chip, the fixed-canvas ``unwarp_native`` at
DIR300-like canvas sizes:

- per (canvas, batch): ms, imgs/sec, which gather path engaged (the
  Pallas strip-mined kernel vs the row-chunked jnp fallback — planes
  beyond the VMEM budget must take the chunked path, the OOM class fixed
  in round 4), and device memory stats when the backend exposes them;
- plus the 512^2 model stages (known from STAGE_PROFILE) to put the
  unwarp share in context of a full hires serve.

Writes ``docs/STAGE_PROFILE_hires.json``.  Run on the chip:
  python tools/hires_profile.py [--canvases 1600 2048 2400] [--batches 2 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvases", type=int, nargs="+",
                    default=[1600, 2048, 2400])
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="docs/STAGE_PROFILE_hires.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvd_tpu.config import default_config
    from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_native
    from dvd_tpu.ops.pallas import grid_sample as pgs
    from dvd_tpu.utils.bench_timing import make_fuse, timed_s
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = default_config()
    s = cfg.model.image_size
    fuse = make_fuse()
    dev = jax.devices()[0]

    def mem_stats():
        try:
            ms = dev.memory_stats()
            return {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                    if k in ms}
        except Exception:  # noqa: BLE001 — tunnel backends may not expose
            return None

    rows = []
    for p in args.canvases:
        for b in args.batches:
            key = jax.random.PRNGKey(p + b)
            src = jax.random.uniform(key, (b, p, p, 3), jnp.float32)
            # true sizes in the DIR300 range, padded into the canvas
            hs = [int(p * f) for f in
                  (0.82, 0.95, 0.88, 1.0, 0.9, 0.8, 0.93, 0.85)][:b]
            ws = [int(p * f) for f in
                  (1.0, 0.78, 0.9, 0.84, 0.95, 0.88, 0.8, 0.97)][:b]
            hw = jnp.asarray(list(zip(hs, ws)), jnp.int32)
            # smooth flow like a real dewarp field (low-res noise,
            # bilinear-upsampled) — the strip-mined gather's cost tracks
            # the coordinate spread per output tile, and white-noise
            # flows with ±0.05·canvas jumps between adjacent pixels are
            # not the serving regime
            from dvd_tpu.ops.resize import resize_bilinear as _rb

            flow = _rb((jax.random.uniform(key, (b, 6, 6, 2)) - 0.5) * 0.1,
                       (s, s), align_corners=True)

            uw = jax.jit(unwarp_native)
            try:
                t = timed_s(uw, src, hw, flow, iters=args.iters, fuse=fuse)
            except Exception as e:  # noqa: BLE001 — record OOM rows
                rows.append({"canvas": p, "batch": b,
                             "error": repr(e)[:300]})
                print(f"canvas {p} b{b} failed: {e!r}", flush=True)
                continue
            pallas = pgs.supports(src.shape, (b, p, p, 2))
            row = {"canvas": p, "batch": b,
                   "unwarp_ms": round(t * 1e3, 2),
                   "unwarp_ms_per_img": round(t * 1e3 / b, 3),
                   "path": "pallas" if pallas else "row_chunked_jnp",
                   "mem": mem_stats()}
            rows.append(row)
            print(row, flush=True)

    # context: the 512^2 model stages at batch 4 (one measurement here so
    # the artifact is self-contained)
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))
    cond_fn, sample_fn = pipe.jitted_stages()
    src4 = jax.random.uniform(jax.random.PRNGKey(1), (4, 512, 512, 3))
    rng = jax.random.PRNGKey(2)

    def model_stages(s512, r):
        c, f0, ft = cond_fn(s512)
        return sample_fn(c, f0, ft, r)

    t_model = timed_s(model_stages, src4, rng, iters=args.iters, fuse=fuse)
    out = {"device": str(dev),
           "model_stages_512_b4_ms": round(t_model * 1e3, 2),
           "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
