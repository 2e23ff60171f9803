#!/usr/bin/env python
"""Score the end-to-end train->checkpoint->serve loop on synthetic Doc3D.

After ``run_training.py --name e2e_demo --synthetic 64`` has written EMA
snapshots, this drives the *serving* stages (the same jitted
conditioning/sampling/unwarp path as ``run_sampling.py``) with the
trained checkpoint over training-distribution samples and scores:

1. **flow EPE** against the sample's ground-truth backward map (the
   direct training-efficacy signal; a zero-flow model scores the warp's
   own magnitude), and
2. **MS-SSIM / LD** of the unwarped output against the flat
   ``recon.png`` via the production metric stack, vs the identity
   baseline (input scored as-is).

One documented substitution: the conditioning ``mask_cat`` is the GT
doc mask instead of GeoTr's predicted mask.  Training (like the
reference, ``train_util.py:318-327``) conditions on the GT mask, and
this environment has no pretrained GeoTr weights — its random-init mask
would be out-of-distribution noise.  Everything else (seg pyramid,
text-line features) runs the same random-init aux nets as training
(identical seed), exactly as the serving path would.

Run:  python tools/e2e_demo_eval.py --ckpt checkpoints/e2e_demo/ema_0.99_001500.msgpack
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_one_step(pipe):
    """pred_x0 of the serving chain's first call (t=T-1, remapped), with
    hypothesis averaging + clamping like the full sampler.  Returns a
    jitted ``fn(cond, rng) -> (1, S, S, 2)`` built once."""
    import jax
    import jax.numpy as jnp

    from dvd_tpu.diffusion import gaussian as G
    from dvd_tpu.diffusion.sampler import _repeat_tree

    cfg = pipe.cfg
    s = cfg.model.image_size
    nb = cfg.diffusion.n_batch

    @jax.jit
    def run(dit_vars, cond, rng):
        cond_r = _repeat_tree(cond, nb)
        x = jax.random.normal(rng, (nb, s, s, 2), jnp.float32)
        t = jnp.full((nb,), pipe.sched.num_timesteps - 1, jnp.int32)
        fn = pipe.make_dit_fn(dit_vars)
        pred_x0, _ = fn(
            x, G.model_t(pipe.sched, t), cond_r,
            init_flow=jnp.zeros((nb, s, s, 2)),
            init_feat=jnp.zeros((nb, s, s, 256)),
            seed_init_feat=jnp.ones((nb,), bool),
            remap_timesteps=True)
        return jnp.clip(jnp.mean(pred_x0.reshape(nb, 1, s, s, 2), 0), -1, 1)

    return lambda cond, rng: run(pipe.dit_vars, cond, rng)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--root", default="checkpoints/synthetic_doc3d")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--seed", type=int, default=42,
                    help="must match training (aux nets are random-init "
                         "from this seed in both phases)")
    ap.add_argument("--out", default="docs/E2E_DEMO.json")
    ap.add_argument("--save_pngs", default=None)
    ap.add_argument("--quantize", default="none", choices=("none", "int8"),
                    help="serve the checkpoint through the int8 path — "
                         "the trained-weights end-metric A/B that decides "
                         "the int8 default (VERDICT r4 item 3)")
    ap.add_argument("--planar", default="auto",
                    choices=("auto", "on", "off"),
                    help="model.planar_aux override for the serving stages")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from dvd_tpu.config import default_config
    from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
    from dvd_tpu.evaluation import metrics as M
    from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_fixed
    from dvd_tpu.ops.resize import resize_bilinear
    from dvd_tpu.training.checkpoint import maybe_load_pipeline_weights
    from dvd_tpu.utils import runtime

    runtime.enable_compilation_cache()
    cfg = default_config().replace(
        paths={"model_path": args.ckpt},
        model={"quantize": args.quantize, "planar_aux": args.planar})
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(args.seed))
    loaded = maybe_load_pipeline_weights(pipe, cfg)
    if not loaded.get("dit_vars"):
        raise SystemExit(f"checkpoint not loaded from {args.ckpt}")

    cond_fn, sample_fn = pipe.jitted_stages()
    one_step = make_one_step(pipe)
    unwarp = jax.jit(unwarp_fixed)
    s = cfg.model.image_size

    ds = Doc3DDataset(samples=make_doc3d_sample_list(args.root,
                                                     split_ratio=1.0))
    rows = []
    for k in range(args.n):
        item = ds.__getitem__(k % len(ds.samples), seed=k)
        src = jnp.asarray(item["source_image"], jnp.float32)[None]
        gt_flow64 = np.asarray(resize_bilinear(
            jnp.asarray(item["flow_map"] / 511.0, jnp.float32)[None],
            (s, s), align_corners=True))[0]
        gt = np.asarray(Image.open(os.path.join(
            args.root, f"syn_{k % len(ds.samples):05d}",
            "recon.png")).convert("RGB"))

        cond, init_flow, init_feat = cond_fn(src)
        # GT-mask substitution (see module docstring)
        cond = dict(cond)
        cond["mask_cat"] = jnp.asarray(item["doc_mask"], jnp.float32)[None]
        flow = sample_fn(cond, init_flow, init_feat,
                         jax.random.PRNGKey(args.seed))

        # 1-step prediction through the serving model fn: the t=T-1 call
        # (pure-noise input, zero recurrent state, seeded features) is the
        # regime the supervised loss trains directly, so it shows learning
        # at small step budgets.  The full 3-step chain above additionally
        # needs the reference's (faithfully reproduced) t-regime quirk to
        # converge: the training rollout runs at rescaled t (667/333, no
        # remap — gaussian_diffusion.py:944, cross_model.py:575-579) while
        # serving remaps to raw t, and the two only become consistent at
        # reference-scale training budgets (the shipped reference model
        # trained 1.852M steps).
        flow1 = one_step(cond, jax.random.PRNGKey(args.seed))

        flow_np = np.asarray(flow)[0]
        f1 = np.asarray(flow1)[0]
        epe_pred = float(np.sqrt(((flow_np - gt_flow64) ** 2).sum(-1)).mean())
        epe_1step = float(np.sqrt(((f1 - gt_flow64) ** 2).sum(-1)).mean())
        epe_zero = float(np.sqrt((gt_flow64 ** 2).sum(-1)).mean())

        src_u8 = np.clip(np.asarray(src)[0] * 255.0, 0, 255).astype(np.uint8)
        pred = np.clip(np.asarray(
            unwarp(jnp.asarray(src_u8, jnp.float32)[None], flow))[0],
            0, 255).astype(np.uint8)
        gt512 = cv2.resize(gt, (512, 512))
        rp = M.evaluate_pair(pred, gt512, protocol_area=None)
        rb = M.evaluate_pair(src_u8, gt512, protocol_area=None)

        pred1 = np.clip(np.asarray(
            unwarp(jnp.asarray(src_u8, jnp.float32)[None], flow1))[0],
            0, 255).astype(np.uint8)
        r1 = M.evaluate_pair(pred1, gt512, protocol_area=None)

        rows.append({"sample": k,
                     "epe": {"pred_3step": epe_pred, "pred_1step": epe_1step,
                             "zero_flow": epe_zero},
                     "pred_3step": {m: rp[m] for m in ("ms_ssim", "ld")},
                     "pred_1step": {m: r1[m] for m in ("ms_ssim", "ld")},
                     "identity": {m: rb[m] for m in ("ms_ssim", "ld")},
                     "flow_absmax": float(np.abs(flow_np).max())})
        print(f"syn_{k:05d}: epe 1step={epe_1step:.4f} 3step={epe_pred:.4f} "
              f"zero={epe_zero:.4f} | 1step ms_ssim={r1['ms_ssim']:.4f} "
              f"ld={r1['ld']:.3f} | identity ms_ssim={rb['ms_ssim']:.4f} "
              f"ld={rb['ld']:.3f}", flush=True)
        if args.save_pngs:
            os.makedirs(args.save_pngs, exist_ok=True)
            Image.fromarray(pred).save(
                os.path.join(args.save_pngs, f"pred_{k:05d}.png"))
            Image.fromarray(src_u8).save(
                os.path.join(args.save_pngs, f"input_{k:05d}.png"))

    mean = lambda path: float(np.mean(
        [r[path[0]][path[1]] for r in rows]))
    result = {
        "ckpt": args.ckpt,
        "n": args.n,
        "epe": {"pred_1step": mean(("epe", "pred_1step")),
                "pred_3step": mean(("epe", "pred_3step")),
                "zero_flow": mean(("epe", "zero_flow"))},
        "pred_1step": {"ms_ssim": mean(("pred_1step", "ms_ssim")),
                       "ld": mean(("pred_1step", "ld"))},
        "pred_3step": {"ms_ssim": mean(("pred_3step", "ms_ssim")),
                       "ld": mean(("pred_3step", "ld"))},
        "identity": {"ms_ssim": mean(("identity", "ms_ssim")),
                     "ld": mean(("identity", "ld"))},
        "per_sample": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "per_sample"}, indent=2))


if __name__ == "__main__":
    main()
