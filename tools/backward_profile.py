#!/usr/bin/env python
"""Backward-pass attribution for the production train loss.

``docs/TRAIN_PROFILE.json`` shows backward ≈ 109 ms vs ~56 ms of
forward theory; this tool attributes it by freezing one parameter
subtree at a time (frozen subtrees are passed as a separate non-diff
argument, so autodiff skips their cotangents entirely — the same math
the reference's ``requires_grad=False`` would give).

Writes ``docs/BACKWARD_PROFILE.json``.  Run: python tools/backward_profile.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="docs/BACKWARD_PROFILE.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvd_tpu.config import default_config
    from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
    from dvd_tpu.data.loader import PrefetchLoader
    from dvd_tpu.data.synthetic import write_synthetic_doc3d
    from dvd_tpu.diffusion import losses as L
    from dvd_tpu.diffusion.schedule import make_schedule
    from dvd_tpu.evaluation.pipeline import DewarpPipeline
    from dvd_tpu.training import train_loop as TL
    from dvd_tpu.utils import runtime
    from dvd_tpu.utils.bench_timing import make_fuse, timed_ms

    runtime.enable_compilation_cache()
    cfg = default_config().replace(train={"batch_size": args.batch})
    root = "checkpoints/synthetic_doc3d"
    write_synthetic_doc3d(root, max(args.batch, 8))
    ds = Doc3DDataset(samples=make_doc3d_sample_list(root, split_ratio=1.0))
    loader = PrefetchLoader(ds, batch_size=args.batch, num_workers=0, seed=0,
                            keys=("source_image", "doc_mask",
                                  "flow_map", "flow_map_inter"))
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))
    sched = make_schedule(steps=cfg.diffusion.diffusion_steps,
                          schedule_name=cfg.diffusion.noise_schedule,
                          respacing=cfg.diffusion.timestep_respacing,
                          rescale_timesteps=cfg.diffusion.rescale_timesteps)
    latent = cfg.model.image_size

    raw = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    batch = jax.jit(
        lambda aux, r: TL.build_device_batch(pipe, aux, r, latent)
    )(TL.train_aux_vars(pipe), raw)
    batch = jax.tree.map(lambda x: x.block_until_ready(), batch)

    bstats = pipe.dit_vars.get("batch_stats", {})

    def loss2(train_p, frozen_p, bch, t, rng):
        params = {**train_p, **frozen_p}

        def model_fn(x, tt, cond, *, init_flow, init_feat, seed_init_feat,
                     remap_timesteps):
            out, _ = pipe.dit.apply(
                {"params": params, "batch_stats": bstats}, x, tt,
                y512=cond["y512"], mask_cat=cond.get("mask_cat"),
                mask_y512=cond["mask_y512"], line_msk=cond["line_msk"],
                init_flow=init_flow, init_feat=init_feat,
                seed_init_feat=seed_init_feat,
                remap_timesteps=remap_timesteps,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)})
            return out

        cond = {k2: bch[k2] for k2 in ("y512", "mask_cat", "mask_y512",
                                       "line_msk")}
        b = bch["flow64"].shape[0]
        z2 = jnp.zeros((b, latent, latent, 2))
        z256 = jnp.zeros((b, latent, latent, 256))
        return L.time_variant_loss(
            model_fn, sched, cond, z2, z256, bch["flow64"],
            bch["flow_inter"], bch["mask"], t, rng)["loss"]

    def vg(train_p, frozen_p, bch, t, rng):
        l, g = jax.value_and_grad(loss2)(train_p, frozen_p, bch, t, rng)
        # reduce grads to one scalar inside the jit so async dispatches
        # don't pile up full gradient trees in HBM
        return l + sum(x.sum().astype(jnp.float32)
                       for x in jax.tree.leaves(g))

    jvg = jax.jit(vg)
    all_params = pipe.dit_vars["params"]
    t0 = jnp.zeros((args.batch,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    fuse = make_fuse()

    variants = {
        "all": [],
        "freeze_pyramid": ["pyramid"],
        "freeze_decoder": ["decoder"],
        "freeze_blocks": [k for k in all_params if k.startswith("blocks_")],
        "freeze_embedders": [k for k in all_params if k.endswith("_embedder")],
    }
    rows = {}
    for name, frozen_keys in variants.items():
        tp = {k: v for k, v in all_params.items() if k not in frozen_keys}
        fp = {k: all_params[k] for k in frozen_keys}
        float(fuse(jvg(tp, fp, batch, t0, rng)))
        ms = timed_ms(lambda tp=tp, fp=fp: jvg(tp, fp, batch, t0, rng),
                      iters=args.iters, fuse=fuse)
        rows[name] = round(ms, 2)
        print(f"{name:>18}: {ms:8.2f} ms", flush=True)

    result = {"device": str(jax.devices()[0]), "batch": args.batch,
              "ms": rows,
              "attrib_ms": {k.replace("freeze_", ""):
                            round(rows["all"] - v, 2)
                            for k, v in rows.items() if k != "all"}}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
