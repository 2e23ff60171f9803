"""End-to-end pipeline smoke test on a tiny configuration.

Exercises every stage the production config uses — GeoTrSegInf mask,
U2NetP seg pyramid, text-line UNet, DiT + 3-step DDIM with time-variant
feature re-warping, hypothesis averaging, and the native-size unwarp —
at reduced resolutions (latent 16, source 128, perception 64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.config import default_config
from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_fixed, unwarp_native


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = default_config().replace(
        model={
            "image_size": 16,
            "source_size": 128,
            "perception_size": 64,
            "dit_variant": "DiT-S/2",
            "compute_dtype": "float32",
        },
        diffusion={"n_batch": 2},
    )
    # shrink the DiT itself for CPU
    pipe = DewarpPipeline.create(cfg)
    from dvd_tpu.models.dit import DiT

    pipe.dit = DiT(input_size=16, patch_size=2, in_channels=2, hidden_size=48,
                   depth=2, num_heads=3, tv=True, chain_blocks=False)
    pipe.init_params(jax.random.PRNGKey(0))
    return pipe


def test_full_dewarp_flow(tiny_pipeline):
    pipe = tiny_pipeline
    src = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    flow = pipe.dewarp_flow(src, jax.random.PRNGKey(2))
    assert flow.shape == (1, 16, 16, 2)
    f = np.asarray(flow)
    assert np.isfinite(f).all()
    assert (f >= -1).all() and (f <= 1).all()


def test_hoisted_pyramid_matches_inline(tiny_pipeline):
    """sampling_impl hoists the DiT's conditioning pyramid out of the DDIM
    loop via the src_feat bypass; the result must equal the inline path
    (pyramid recomputed inside every denoiser call, as the reference does).
    """
    from dvd_tpu.diffusion.sampler import ddim_sample_loop

    pipe = tiny_pipeline
    src = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3))
    cond, init_flow, init_feat = pipe.build_conditioning(src)
    assert cond.get("src_feat") is None   # production: train_VGG=True
    rng = jax.random.PRNGKey(4)

    hoisted = pipe.sampling_impl(pipe.dit_vars, cond, init_flow, init_feat,
                                 rng)
    inline = ddim_sample_loop(
        pipe.make_dit_fn(pipe.dit_vars), pipe.sched, cond, init_flow,
        init_feat, rng=rng, latent_size=pipe.cfg.model.image_size,
        n_batch=pipe.cfg.diffusion.n_batch, time_variant=True,
        eta=0.0, clip_denoised=False,
    ).flow
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(inline),
                               rtol=1e-5, atol=1e-6)


def test_unwarp_native_matches_fixed():
    """The shape-static padded unwarp must agree with the static-shape
    reference implementation on the valid region."""
    rng = np.random.RandomState(0)
    h, w, p = 40, 56, 64
    src = rng.rand(1, h, w, 3).astype(np.float32)
    flow = (rng.rand(1, 16, 16, 2).astype(np.float32) - 0.5) * 0.1

    fixed = np.asarray(unwarp_fixed(jnp.asarray(src), jnp.asarray(flow)))

    padded = np.zeros((1, p, p, 3), np.float32)
    padded[:, :h, :w] = src
    out = np.asarray(
        unwarp_native(jnp.asarray(padded), jnp.asarray([[h, w]]), jnp.asarray(flow))
    )
    np.testing.assert_allclose(out[:, :h, :w], fixed, atol=2e-3)


def test_unwarp_identity_flow_recovers_image():
    """Zero flow + shrink=1 must reproduce the source exactly."""
    rng = np.random.RandomState(1)
    src = rng.rand(1, 32, 48, 3).astype(np.float32)
    flow = np.zeros((1, 16, 16, 2), np.float32)
    out = np.asarray(unwarp_fixed(jnp.asarray(src), jnp.asarray(flow), shrink=1.0))
    np.testing.assert_allclose(out, src, atol=1e-4)
