"""Conditioning-flag combinations (reference local.py:30-33):
use_gt_mask=True (no seg/line streams), use_line_mask=False (no line
stream), train_VGG=False (external VGG c20 conditioning replaces the DiT's
private pyramid).  Each changes the DiT stream count / decoder width."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.config import default_config
from dvd_tpu.evaluation.pipeline import DewarpPipeline

S, SRC, PER = 16, 128, 64


def _pipe(**model_over):
    cfg = default_config().replace(
        model={"image_size": S, "source_size": SRC, "perception_size": PER,
               "compute_dtype": "float32", "dit_variant": "DiT-mini",
               **model_over},
        diffusion={"n_batch": 1},
    )
    return DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))


@pytest.mark.parametrize("flags,cond_keys", [
    ({"use_gt_mask": True}, {"y512", "mask_cat"}),
    pytest.param({"use_line_mask": False},
                 {"y512", "mask_cat", "mask_y512"},
                 marks=pytest.mark.slow),
    pytest.param({"train_VGG": False},
                 {"y512", "mask_cat", "mask_y512", "line_msk", "src_feat"},
                 marks=pytest.mark.slow),
])
def test_flag_combination_runs(flags, cond_keys):
    pipe = _pipe(**flags)
    src = jax.random.uniform(jax.random.PRNGKey(1), (2, SRC, SRC, 3))
    cond, init_flow, init_feat = pipe.build_conditioning(src)
    assert set(cond) == cond_keys, set(cond)
    flow = pipe.dewarp_flow(src, jax.random.PRNGKey(2))
    assert flow.shape == (2, S, S, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


# ------------------------------------------------------------------ training
# The reference's training driver honors the same flags
# (train_util.py:275-304): seg/line streams gated by use_gt_mask /
# use_line_mask, external VGG c20 computed when train_VGG=False.  One
# train step per combo must produce finite loss and nonzero finite grads.
@pytest.mark.parametrize("flags,batch_keys", [
    ({}, {"mask_y512", "line_msk"}),
    ({"use_gt_mask": True}, set()),
    pytest.param({"use_line_mask": False}, {"mask_y512"},
                 marks=pytest.mark.slow),
    pytest.param({"train_VGG": False},
                 {"mask_y512", "line_msk", "src_feat"},
                 marks=pytest.mark.slow),
])
def test_train_step_flag_combinations(flags, batch_keys):
    from dvd_tpu.diffusion.schedule import make_schedule
    from dvd_tpu.training.train_loop import build_device_batch, train_aux_vars
    from dvd_tpu.training.train_state import (create_train_state,
                                              make_optimizer, make_train_step)

    pipe = _pipe(**flags)
    cfg = pipe.cfg
    rng = jax.random.PRNGKey(3)
    b = 2
    raw = {
        "source_image": jax.random.uniform(rng, (b, SRC, SRC, 3)),
        "doc_mask": jnp.ones((b, SRC, SRC, 1)),
        "flow_map": jax.random.normal(rng, (b, SRC, SRC, 2)) * 4.0,
        "flow_map_inter": jnp.zeros((b, SRC, SRC, 2)),
    }
    batch = jax.jit(
        lambda aux, r: build_device_batch(pipe, aux, r, S)
    )(train_aux_vars(pipe), raw)
    base = {"y512", "mask_cat", "flow64", "flow_inter", "mask"}
    assert set(batch) == base | batch_keys, set(batch)

    sched = make_schedule(steps=cfg.diffusion.diffusion_steps,
                          schedule_name=cfg.diffusion.noise_schedule,
                          respacing=cfg.diffusion.timestep_respacing,
                          rescale_timesteps=cfg.diffusion.rescale_timesteps)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, pipe.dit_vars, tx)
    step_fn = jax.jit(make_train_step(cfg, sched, pipe.dit.apply, tx))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    gn = float(metrics["grad_norm"])
    assert np.isfinite(gn) and gn > 0.0
