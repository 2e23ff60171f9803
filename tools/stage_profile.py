#!/usr/bin/env python
"""Per-stage inference timing at several batch sizes on the real chip.

Times conditioning (aux nets), diffusion sampling (DiT x 3 DDIM x 2
hypotheses), and the 512^2 unwarp separately, plus the fused end-to-end
dispatch, so optimization targets the real bottleneck.

Writes docs/STAGE_PROFILE.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="docs/STAGE_PROFILE.json")
    ap.add_argument("--cond_chunk", type=int, default=0,
                    help="model.serve_cond_chunk override (0 = monolithic)")
    ap.add_argument("--planar", default="auto",
                    choices=("auto", "on", "off"),
                    help="model.planar_aux override")
    ap.add_argument("--quantize", default="none", choices=("none", "int8"))
    args = ap.parse_args()

    import jax

    from dvd_tpu.config import default_config
    from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_fixed
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = default_config().replace(
        model={"planar_aux": args.planar, "quantize": args.quantize})
    if args.cond_chunk:
        cfg = cfg.replace(model={"serve_cond_chunk": args.cond_chunk})
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))
    cond_fn, sample_fn = pipe.jitted_stages()
    unwarp = jax.jit(unwarp_fixed)

    from dvd_tpu.utils.bench_timing import make_fuse, timed_s

    fuse = make_fuse()

    def timed(fn, *a, iters=args.iters):
        return timed_s(fn, *a, iters=iters, fuse=fuse)

    rows = []
    for b in args.batches:
        src = jax.random.uniform(jax.random.PRNGKey(1), (b, 512, 512, 3))
        rng = jax.random.PRNGKey(2)
        t_cond = timed(cond_fn, src)
        cond, init_flow, init_feat = cond_fn(src)
        jax.block_until_ready(cond)
        t_sample = timed(lambda c, f0, ft, r: sample_fn(c, f0, ft, r),
                         cond, init_flow, init_feat, rng)
        flow = sample_fn(cond, init_flow, init_feat, rng)
        jax.block_until_ready(flow)
        t_unwarp = timed(unwarp, src, flow)

        def full(s, r):
            c, f0, ft = cond_fn(s)
            fl = sample_fn(c, f0, ft, r)
            return unwarp(s, fl)

        t_full = timed(full, src, rng)
        row = {
            "batch": b,
            "cond_ms": round(t_cond * 1e3, 2),
            "sample_ms": round(t_sample * 1e3, 2),
            "unwarp_ms": round(t_unwarp * 1e3, 2),
            "full_ms": round(t_full * 1e3, 2),
            "imgs_per_sec": round(b / t_full, 2),
        }
        rows.append(row)
        print(row, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
