#!/usr/bin/env python
"""Per-net conditioning roofline on the real chip (VERDICT r4 item 1).

The serving stage profile (docs/STAGE_PROFILE_r3.json) shows per-image
throughput *falling* with batch (45.7 imgs/s @4 -> 40.4 @16) and lumps
the whole conditioning stage into one number.  This tool breaks the
conditioning stage (and the sample stage's per-step DiT call) into its
component nets and, for each (net, batch), records:

- measured ms (fused-readback timing, tunnel-safe),
- XLA's own FLOP / HBM-byte estimates (``compiled.cost_analysis()``),
- % of v5e bf16 peak (197 TF/s) and % of HBM peak (819 GB/s),
- which bound (compute vs memory) the net is against.

Writes ``docs/COND_PROFILE.json``.  Run on the chip:
  python tools/cond_profile.py [--batches 4 8 16 32] [--iters 10]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12     # v5e bf16 (tools/attn_calibrate.py: 99% reachable)
PEAK_BYTES = 819e9      # v5e HBM GB/s


def cost(compiled):
    """XLA cost analysis -> (flops, bytes) or (None, None) if absent."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        return float(ca.get("flops", 0.0)), \
            float(ca.get("bytes accessed", 0.0))
    except Exception:  # noqa: BLE001 — remote backends may not expose it
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="docs/COND_PROFILE.json")
    ap.add_argument("--nets", nargs="*", default=None,
                    help="only profile nets whose name contains any of "
                         "these substrings")
    ap.add_argument("--planar", default="auto",
                    choices=("auto", "on", "off"),
                    help="model.planar_aux override (A/B the planar "
                         "Pallas conv stack vs the NHWC flax path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvd_tpu.config import default_config
    from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_fixed
    from dvd_tpu.ops.resize import resize_bilinear
    from dvd_tpu.utils.bench_timing import make_fuse, timed_s
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = default_config().replace(model={"planar_aux": args.planar})
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))
    fuse = make_fuse()
    per = cfg.model.perception_size
    s = cfg.model.image_size

    from dvd_tpu.models.dit import (conditioning_pyramid_features,
                                    embed_stream_tokens)
    from dvd_tpu.models.u2net import seg_pyramid_to_latent

    # ---- component fns (all take traced vars; jitted once per batch) ----
    def f_resize288(_, src512):
        return resize_bilinear(src512, (per, per), align_corners=True)

    def f_geotr(gv, src288):
        return pipe.geotr.apply(gv, src288)

    def f_seg(sv, src288):
        return pipe.seg.apply(sv, src288)

    def f_pyr_latent(_, seg_outs):
        return seg_pyramid_to_latent(seg_outs, s)

    def f_line(lv, mskx):
        feat, _ = pipe.line.apply(lv, mskx)
        return resize_bilinear(feat, (s, s), align_corners=False)

    def f_dit_pyramid(dv, y512, mask512):
        return conditioning_pyramid_features(
            dv["params"]["pyramid"], y512, mask512, s, pipe.dit.dtype)

    def f_tokens(dv, src_feat, mask_y512, line_msk):
        return embed_stream_tokens(pipe.dit, dv["params"], feat=src_feat,
                                   mask_y512=mask_y512, line_msk=line_msk)

    def f_cond_full(aux, src512):
        return pipe.conditioning_impl(aux, src512)

    rows = []

    def run(name, fn, *concrete, batch):
        if args.nets and not any(sub in name for sub in args.nets):
            return None
        jf = jax.jit(fn)
        try:
            compiled = jf.lower(*concrete).compile()
            fl, by = cost(compiled)
            t = timed_s(jf, *concrete, iters=args.iters, fuse=fuse)
        except Exception as e:  # noqa: BLE001 — isolate per-net failures
            rows.append({"net": name, "batch": batch,
                         "error": repr(e)[:200]})
            print(f"{name} b{batch} failed: {e!r}", flush=True)
            return None
        row = {"net": name, "batch": batch, "ms": round(t * 1e3, 2),
               "ms_per_img": round(t * 1e3 / batch, 3)}
        if fl is not None:
            row.update({
                "gflops": round(fl / 1e9, 1),
                "hbm_mb": round(by / 1e6, 1),
                "pct_flops_peak": round(100 * fl / t / PEAK_FLOPS, 1),
                "pct_hbm_peak": round(100 * by / t / PEAK_BYTES, 1),
                "bound": "compute" if fl / PEAK_FLOPS > by / PEAK_BYTES
                         else "memory",
            })
        rows.append(row)
        print(row, flush=True)
        return jf(*concrete)

    aux = (pipe.seg_vars, pipe.line_vars, pipe.geotr_vars, pipe.vgg_vars)
    for b in args.batches:
        src512 = jax.random.uniform(jax.random.PRNGKey(1), (b, 512, 512, 3))
        src288 = resize_bilinear(src512, (per, per), align_corners=True)
        src288 = jax.block_until_ready(src288)

        run("resize_512_288", f_resize288, None, src512, batch=b)
        geo = run("geotr_mask", f_geotr, pipe.geotr_vars, src288, batch=b)
        seg_out = run("u2netp_seg", f_seg, pipe.seg_vars, src288, batch=b)
        if seg_out is not None:
            mskx = seg_out[0]
            pyramid6 = tuple(seg_out[2:8])
            run("seg_pyr_to_latent", f_pyr_latent, None, pyramid6, batch=b)
            run("line_unet", f_line, pipe.line_vars, mskx, batch=b)
        mask512 = geo[1] if geo is not None else \
            jnp.zeros((b, 512, 512, 1))
        feat = run("dit_pyramid_512", f_dit_pyramid, pipe.dit_vars,
                   src512, mask512, batch=b)
        if feat is not None and seg_out is not None:
            my = seg_pyramid_to_latent(pyramid6, s)
            lm = f_line(pipe.line_vars, mskx)
            my, lm = jax.block_until_ready((my, lm))
            run("stream_tokens", f_tokens, pipe.dit_vars, feat, my, lm,
                batch=b)
        run("cond_stage_fused", f_cond_full, aux, src512, batch=b)

        # one DiT denoiser call at the DDIM loop's effective batch
        # (n_batch hypotheses ride the batch dim)
        eb = b * cfg.diffusion.n_batch
        cond, init_flow, init_feat = jax.jit(pipe.conditioning_impl)(
            aux, src512)
        cond = pipe._hoist_pyramid(pipe.dit_vars, cond)
        cond = pipe._hoist_stream_tokens(pipe.dit_vars, cond)
        tile = lambda x: jnp.concatenate([x] * cfg.diffusion.n_batch) \
            if x is not None else None
        cond_eb = {k: tile(v) for k, v in cond.items()}
        x = jnp.zeros((eb, s, s, 2))
        t_step = jnp.full((eb,), 2.0)
        fl0 = tile(init_flow)
        ft0 = tile(init_feat)

        def f_dit_step(dv, x, tt, cnd, fl, ft):
            fn = pipe.make_dit_fn(dv)
            return fn(x, tt, cnd, init_flow=fl, init_feat=ft,
                      seed_init_feat=jnp.ones((x.shape[0],), bool),
                      remap_timesteps=True)

        cond_eb, x, fl0, ft0 = jax.block_until_ready((cond_eb, x, fl0, ft0))
        run(f"dit_step_eb{eb}", f_dit_step, pipe.dit_vars, x, t_step,
            cond_eb, fl0, ft0, batch=b)

        run("unwarp_512", lambda _, s5, fl: unwarp_fixed(s5, fl),
            None, src512, jnp.zeros((b, s, s, 2)), batch=b)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]),
                   "peak_flops": PEAK_FLOPS, "peak_bytes": PEAK_BYTES,
                   "rows": rows}, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
