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
