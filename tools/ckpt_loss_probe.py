#!/usr/bin/env python
"""Does a saved checkpoint reproduce its training behavior?  Computes the
production time-variant loss on a training-distribution batch with the
loaded params, and probes the serving first-step call (t=T-1, zero
states, seeded features)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dvd_tpu.config import default_config
from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
from dvd_tpu.diffusion import losses as L
from dvd_tpu.diffusion.schedule import make_schedule
from dvd_tpu.evaluation.pipeline import DewarpPipeline
from dvd_tpu.training.checkpoint import maybe_load_pipeline_weights
from dvd_tpu.training import train_loop as TL
from dvd_tpu.utils import runtime

ckpt = sys.argv[1]
runtime.enable_compilation_cache()
cfg = default_config().replace(paths={"model_path": ckpt})
pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(42))
assert maybe_load_pipeline_weights(pipe, cfg)["dit_vars"]
sched = make_schedule(steps=cfg.diffusion.diffusion_steps,
                      schedule_name=cfg.diffusion.noise_schedule,
                      respacing=cfg.diffusion.timestep_respacing,
                      rescale_timesteps=cfg.diffusion.rescale_timesteps)

ds = Doc3DDataset(samples=make_doc3d_sample_list(
    "checkpoints/synthetic_doc3d", split_ratio=1.0))
b = 4
raw = {k: jnp.asarray(np.stack([ds.__getitem__(i, seed=i)[k]
                                for i in range(b)]))
       for k in ("source_image", "doc_mask", "flow_map", "flow_map_inter")}
batch = jax.jit(lambda aux, r: TL.build_device_batch(pipe, aux, r, 64))(
    TL.train_aux_vars(pipe), raw)

def model_fn(x, tt, cond, *, init_flow, init_feat, seed_init_feat,
             remap_timesteps):
    out, _ = pipe.dit.apply(
        pipe.dit_vars, x, tt,
        y512=cond["y512"], mask_cat=cond.get("mask_cat"),
        mask_y512=cond["mask_y512"], line_msk=cond["line_msk"],
        init_flow=init_flow, init_feat=init_feat,
        seed_init_feat=seed_init_feat, remap_timesteps=remap_timesteps,
        train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    return out

cond = {k: batch[k] for k in ("y512", "mask_cat", "mask_y512", "line_msk")}
z2 = jnp.zeros((b, 64, 64, 2)); z256 = jnp.zeros((b, 64, 64, 256))

@jax.jit
def loss_at(t):
    return L.time_variant_loss(model_fn, sched, cond, z2, z256,
                               batch["flow64"], batch["flow_inter"],
                               batch["mask"], t,
                               jax.random.PRNGKey(3))["loss"]

for tv in (0, 1, 2):
    t = jnp.full((b,), tv, jnp.int32)
    print(f"time_variant loss at t={tv}: {float(loss_at(t)):.5f}", flush=True)

# serving first-step call: t=T-1, zero states, seeded feat
x = jax.random.normal(jax.random.PRNGKey(7), (b, 64, 64, 2))
out = model_fn(x, jnp.full((b,), 2.0), cond, init_flow=z2, init_feat=z256,
               seed_init_feat=jnp.ones((b,), bool), remap_timesteps=False)
flow = np.asarray(out[0])
print(f"first-step call t=2 seeded: |out|mean={np.abs(flow).mean():.4f} "
      f"|out|max={np.abs(flow).max():.4f}")
gt = np.asarray(batch["flow64"])
print(f"gt flow64: |gt|mean={np.abs(gt).mean():.4f} max={np.abs(gt).max():.4f}")
