#!/usr/bin/env python
"""Isolate serve-vs-train skew for a trained checkpoint: run the SAME
supervised-style model call on a training-distribution batch in
train=True (BN batch stats) vs train=False (BN running stats) and
compare the predicted flows."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dvd_tpu.config import default_config
from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
from dvd_tpu.evaluation.pipeline import DewarpPipeline
from dvd_tpu.training.checkpoint import maybe_load_pipeline_weights
from dvd_tpu.training import train_loop as TL
from dvd_tpu.utils import runtime

ckpt = sys.argv[1]
runtime.enable_compilation_cache()
cfg = default_config().replace(paths={"model_path": ckpt})
pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(42))
ld = maybe_load_pipeline_weights(pipe, cfg)
assert ld["dit_vars"], ckpt
bs = pipe.dit_vars.get("batch_stats", {})
print("batch_stats leaves:", len(jax.tree.leaves(bs)))
if jax.tree.leaves(bs):
    means = [float(jnp.abs(x).mean()) for x in jax.tree.leaves(bs)]
    print("  mean|stat| range:", min(means), max(means))

ds = Doc3DDataset(samples=make_doc3d_sample_list(
    "checkpoints/synthetic_doc3d", split_ratio=1.0))
raw = {k: jnp.asarray(np.stack([ds.__getitem__(i, seed=i)[k]
                                for i in range(2)]))
       for k in ("source_image", "doc_mask", "flow_map", "flow_map_inter")}
batch = jax.jit(lambda aux, r: TL.build_device_batch(pipe, aux, r, 64))(
    TL.train_aux_vars(pipe), raw)

t = jnp.zeros((2,), jnp.float32)   # supervised-style t=0 call
x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 2)) * 0.1
z2 = jnp.zeros((2, 64, 64, 2)); z256 = jnp.zeros((2, 64, 64, 256))

def call(train):
    kw = dict(y512=batch["y512"], mask_cat=batch["mask_cat"],
              mask_y512=batch["mask_y512"], line_msk=batch["line_msk"],
              init_flow=z2, init_feat=z256,
              seed_init_feat=jnp.zeros((2,), bool),
              remap_timesteps=False)
    if train:
        out, _ = pipe.dit.apply(pipe.dit_vars, x, t, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(1)},
                                **kw)
    else:
        out = pipe.dit.apply(pipe.dit_vars, x, t, train=False, **kw)
    return out

for train in (True, False):
    o = call(train)
    flow = np.asarray(o[0] if isinstance(o, tuple) else o)
    print(f"train={train}: |out|mean={np.abs(flow).mean():.4f} "
          f"|out|max={np.abs(flow).max():.4f}")
