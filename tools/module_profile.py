#!/usr/bin/env python
"""Per-module roofline profile of the inference path on the real chip.

Times each compute module at production shapes (effective sample-stage
batch = batch x n_batch hypotheses), reads XLA's own FLOP estimate from
``compiled.cost_analysis()``, and reports achieved TFLOP/s so optimization
effort lands where the cycles are.  Complements tools/stage_profile.py
(which times the three fused pipeline stages).

Writes docs/MODULE_PROFILE.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_TFLOPS = 197.0  # per chip, public spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4,
                    help="image batch (sample stage runs batch*n_batch)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="docs/MODULE_PROFILE.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvd_tpu.config import default_config
    from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_fixed
    from dvd_tpu.models import satrn
    from dvd_tpu.models.dit import ConditioningPyramid
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = default_config()
    m = cfg.model
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))

    b = args.batch
    eb = b * cfg.diffusion.n_batch          # effective sample-stage batch
    s = m.image_size
    per = m.perception_size
    k = pipe.dit.n_streams
    d = pipe.dit.hidden_size

    from dvd_tpu.utils.bench_timing import make_fuse, timed_s

    fuse = make_fuse()

    def bench(name, fn, *a):
        jit = jax.jit(fn)
        compiled = jit.lower(*a).compile()
        ca = compiled.cost_analysis() or {}
        flops = float(ca.get("flops", 0.0))
        dt = timed_s(jit, *a, iters=args.iters, fuse=fuse)
        row = {
            "module": name,
            "ms": round(dt * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "tflops_per_sec": round(flops / dt / 1e12, 1),
            "mxu_util_pct": round(flops / dt / 1e12
                                  / V5E_PEAK_BF16_TFLOPS * 100, 1),
        }
        print(row, flush=True)
        return row

    key = jax.random.PRNGKey(1)
    rows = []

    # ---- sample-stage modules at effective batch (b * n_batch) ----------
    dv = pipe.dit_vars
    dd = jnp.dtype(m.compute_dtype)
    fused_img = jax.random.normal(key, (eb, s // 2, s // 2, k * d), dd)
    dec = satrn.Decoder(n_layers=6, n_head=6, d_k=64 * k, d_v=64 * k,
                        d_model=d * k, n_position=s // 2, d_inner=2048,
                        dtype=pipe.dit.dtype)
    rows.append(bench(
        f"satrn_decoder x1 (eb={eb})",
        lambda v, x: dec.apply(
            {"params": v["params"]["decoder"],
             "batch_stats": v["batch_stats"]["decoder"]}, x),
        dv, fused_img))

    y512 = jax.random.uniform(key, (eb, m.source_size, m.source_size, 4), dd)
    pyr = ConditioningPyramid(s, pipe.dit.dtype)
    rows.append(bench(
        f"cond_pyramid x1 (eb={eb})",
        lambda v, x: pyr.apply({"params": v["params"]["pyramid"]}, x),
        dv, y512))

    # full DiT forward (pyramid hoisted, as in production sampling)
    src_feat = jax.random.normal(key, (eb, s, s, 256))
    dit_in = dict(
        x=jax.random.normal(key, (eb, s, s, 2)),
        t=jnp.full((eb,), 666.7),
        y512=y512[..., :3].astype(jnp.float32),
        mask_cat=None,
        mask_y512=jax.random.normal(key, (eb, s, s, 384)),
        line_msk=jax.random.normal(key, (eb, s, s, 64)),
        init_flow=jnp.zeros((eb, s, s, 2)),
        init_feat=jnp.zeros((eb, s, s, 256)),
    )

    def dit_fwd(v, inp, src_feat):
        return pipe.dit.apply(
            v, inp["x"], inp["t"], y512=inp["y512"], mask_cat=inp["mask_cat"],
            mask_y512=inp["mask_y512"], line_msk=inp["line_msk"],
            init_flow=inp["init_flow"], init_feat=inp["init_feat"],
            src_feat=src_feat, remap_timesteps=True)[0]

    rows.append(bench(f"dit_fwd x1 hoisted (eb={eb})", dit_fwd, dv, dit_in,
                      src_feat))

    # ---- conditioning-stage modules at image batch ----------------------
    src288 = jax.random.uniform(key, (b, per, per, 3))
    rows.append(bench(f"geotr_seg_inf (b={b})",
                      lambda v, x: pipe.geotr.apply(v, x),
                      pipe.geotr_vars, src288))
    rows.append(bench(f"u2net_seg (b={b})",
                      lambda v, x: pipe.seg.apply(v, x),
                      pipe.seg_vars, src288))
    rows.append(bench(f"textline_unet (b={b})",
                      lambda v, x: pipe.line.apply(v, x),
                      pipe.line_vars, src288))

    # ---- unwarp at 512^2 -------------------------------------------------
    src512 = jax.random.uniform(key, (b, 512, 512, 3))
    flow = 0.01 * jax.random.normal(key, (b, s, s, 2))
    rows.append(bench(f"unwarp_512 (b={b})", unwarp_fixed, src512, flow))

    out = {"device": str(jax.devices()[0]), "batch": b,
           "effective_sample_batch": eb, "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
