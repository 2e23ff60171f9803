#!/usr/bin/env python
"""Train-step ablation profile on the real chip.

Times the production train step and targeted ablations so optimization
effort lands on measured cost, not guesses:

- ``full``       the production step (tv rollout + 512^2 composed-warp loss)
- ``loss64``     same step, but flow_inter/mask fed at 64^2 — ablates the
                 512^2 resize + warp gather and its VJP
- ``no_tv``      iter=False (``composed_warp_loss``): 1 model call instead
                 of 3 — the rollout's 2 extra forwards (incl. whether XLA
                 CSE dedupes the 512^2 conditioning pyramid across calls)
- ``fwd_only``   loss forward without value_and_grad — isolates backward
- ``opt_only``   optimizer + EMA update on precomputed grads — param-
                 bandwidth floor (adamw moments + EMA trees)

Writes ``docs/TRAIN_PROFILE.json``.  Run: python tools/train_profile.py
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
    ap.add_argument("--out", default="docs/TRAIN_PROFILE.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvd_tpu.config import default_config
    from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
    from dvd_tpu.data.loader import PrefetchLoader
    from dvd_tpu.data.synthetic import write_synthetic_doc3d
    from dvd_tpu.diffusion.schedule import make_schedule
    from dvd_tpu.evaluation.pipeline import DewarpPipeline
    from dvd_tpu.ops.resize import resize_bilinear
    from dvd_tpu.training import train_loop as TL
    from dvd_tpu.training.train_state import (create_train_state,
                                              make_optimizer, make_train_step)
    from dvd_tpu.utils import runtime
    from dvd_tpu.utils.bench_timing import make_fuse, timed_ms

    runtime.enable_compilation_cache()
    cfg = default_config().replace(train={"batch_size": args.batch})
    root = "checkpoints/synthetic_doc3d"
    write_synthetic_doc3d(root, max(args.batch, 8))
    samples = make_doc3d_sample_list(root, split_ratio=1.0)
    ds = Doc3DDataset(samples=samples)
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

    # 64^2 loss ablation: same step fn, small-plane flow_inter/mask
    batch64 = dict(batch)
    batch64["flow_inter"] = resize_bilinear(
        batch["flow_inter"], (latent, latent), align_corners=True)
    batch64["mask"] = (resize_bilinear(
        batch["mask"], (latent, latent), align_corners=True) > 0.5
    ).astype(batch["mask"].dtype)

    fuse = make_fuse()
    rng = jax.random.PRNGKey(0)
    rows = {}

    def time_step(name, cfg_v, bch):
        """Chained donated steps (state_{i+1} <- step(state_i)), exactly
        like real training — donation keeps one state's buffers live, and
        the state dependency serializes the steps on-device."""
        import time as _time

        tx = make_optimizer(cfg_v)
        step = jax.jit(make_train_step(cfg_v, sched, pipe.dit.apply, tx),
                       donate_argnums=(0,))
        # copy: donation on the first step would free pipe.dit_vars
        state = create_train_state(
            cfg_v, jax.tree.map(jnp.copy, pipe.dit_vars), tx)
        state, m = step(state, bch, rng)
        float(fuse(m["loss"]))
        t0 = _time.perf_counter()
        ls = []
        for _ in range(args.iters):
            state, m = step(state, bch, rng)
            ls.append(m["loss"])
        float(fuse(ls))
        ms = (_time.perf_counter() - t0) / args.iters * 1e3
        del state, m, ls
        rows[name] = round(ms, 2)
        print(f"{name:>10}: {ms:8.2f} ms", flush=True)

    time_step("full", cfg, batch)
    time_step("loss64", cfg, batch64)
    time_step("no_tv", cfg.replace(model={"iter": False}), batch)

    # forward-only (production loss, no grad)
    from dvd_tpu.diffusion import losses as L

    def fwd_loss(params, bstats, bch, t, k):
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
                rngs={"dropout": jax.random.fold_in(k, 1)})
            return out

        cond = {k2: bch[k2] for k2 in ("y512", "mask_cat", "mask_y512",
                                       "line_msk")}
        b = bch["flow64"].shape[0]
        z2 = jnp.zeros((b, latent, latent, 2))
        z256 = jnp.zeros((b, latent, latent, 256))
        return L.time_variant_loss(
            model_fn, sched, cond, z2, z256, bch["flow64"],
            bch["flow_inter"], bch["mask"], t, k)["loss"]

    jfwd = jax.jit(fwd_loss)
    t0 = jnp.zeros((args.batch,), jnp.int32)
    dv = {"params": pipe.dit_vars["params"],
          "batch_stats": pipe.dit_vars.get("batch_stats", {})}
    float(fuse(jfwd(dv["params"], dv["batch_stats"], batch, t0, rng)))
    rows["fwd_only"] = round(timed_ms(
        lambda: jfwd(dv["params"], dv["batch_stats"], batch, t0, rng),
        iters=args.iters, fuse=fuse), 2)
    print(f"{'fwd_only':>10}: {rows['fwd_only']:8.2f} ms", flush=True)

    # optimizer + EMA floor on zero grads
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, pipe.dit_vars, tx)

    def opt_only(st, grads):
        import optax
        upd, new_opt = tx.update(grads, st.opt_state, st.params)
        new_p = optax.apply_updates(st.params, upd)
        ema = tuple(jax.tree.map(lambda e, p: e * r + p * (1 - r), et, new_p)
                    for r, et in zip(cfg.train.ema_rates, st.ema_params))
        # reduce to one scalar inside the jit: the full new state would be
        # ~2.4 GB/call of outputs piling up across async dispatches
        return sum(x.sum() for x in
                   jax.tree.leaves((new_p, new_opt, ema))).astype(jnp.float32)

    jopt = jax.jit(opt_only)
    zg = jax.tree.map(jnp.zeros_like, state.params)
    float(fuse(jopt(state, zg)))
    rows["opt_only"] = round(timed_ms(lambda: jopt(state, zg),
                                      iters=args.iters, fuse=fuse), 2)
    print(f"{'opt_only':>10}: {rows['opt_only']:8.2f} ms", flush=True)

    result = {"device": str(jax.devices()[0]), "batch": args.batch,
              "ms": rows,
              "notes": {
                  "warp512_attrib_ms": round(rows["full"] - rows["loss64"], 2),
                  "rollout_attrib_ms": round(rows["full"] - rows["no_tv"], 2),
                  "backward_attrib_ms": round(rows["full"] - rows["fwd_only"]
                                              - rows["opt_only"], 2)}}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
