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


def test_chunked_conditioning_matches_monolithic(tiny_pipeline):
    """serve_cond_chunk runs the aux stack in lax.map sub-batches (the
    HBM-bound stack streams best at small batch — docs/COND_PROFILE.json);
    outputs must match the monolithic trace exactly (same per-sample ops).
    """
    import dataclasses

    pipe = tiny_pipeline
    src = jax.random.uniform(jax.random.PRNGKey(7), (4, 128, 128, 3))
    aux = (pipe.seg_vars, pipe.line_vars, pipe.geotr_vars, pipe.vgg_vars)
    mono = pipe.conditioning_impl(aux, src)

    chunked_pipe = dataclasses.replace(
        pipe, cfg=pipe.cfg.replace(model={"serve_cond_chunk": 2}))
    chunked = chunked_pipe.conditioning_impl(aux, src)

    # not bitwise: XLA's conv tiling (and thus reduction order) legally
    # differs between the chunk and full batch shapes
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-5),
        mono, chunked)
    # non-divisible batches fall back to the monolithic path
    src5 = jax.random.uniform(jax.random.PRNGKey(8), (5, 128, 128, 3))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        pipe.conditioning_impl(aux, src5),
        chunked_pipe.conditioning_impl(aux, src5))


def test_planar_conditioning_matches_nhwc(tiny_pipeline):
    """model.planar_aux="on" routes the aux stack through the planar conv
    path (Pallas on TPU, XLA planar fallback here): same math as the NHWC
    flax modules up to f32 accumulation order (models/planar_aux.py)."""
    import dataclasses

    pipe = tiny_pipeline
    src = jax.random.uniform(jax.random.PRNGKey(9), (2, 128, 128, 3))
    aux = (pipe.seg_vars, pipe.line_vars, pipe.geotr_vars, pipe.vgg_vars)
    nhwc = pipe.conditioning_impl(aux, src)

    planar_pipe = dataclasses.replace(
        pipe, cfg=pipe.cfg.replace(model={"planar_aux": "on"}))
    planar = planar_pipe.conditioning_impl(aux, src)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        nhwc, planar)


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


@pytest.mark.slow
def test_corruption_sweep_reuses_compiled_stages(tmp_path, monkeypatch):
    """run_sampling's corruption sweep (reference run_sampling.py:52-58):
    every (corruption, severity) combo must reuse ONE pipeline and its
    compiled stages — r3 retraced both jitted stages per combo."""
    import dataclasses
    import sys

    from PIL import Image

    sys.path.insert(0, ".")
    from run_sampling import run_corruption_sweep

    rng = np.random.RandomState(0)
    ds_dir = tmp_path / "ds"
    ds_dir.mkdir()
    for k in (1, 2):
        Image.fromarray(
            (rng.rand(96, 80, 3) * 255).astype(np.uint8)
        ).save(ds_dir / f"{k}_1 copy.png")

    cfg = default_config().replace(
        model={"image_size": 16, "source_size": 128, "perception_size": 64,
               "dit_variant": "DiT-S/8", "compute_dtype": "float32"},
        diffusion={"n_batch": 2},
        data={"eval_dataset": str(ds_dir), "eval_dataset_name": "synth",
              "eval_device_batch": 2},
    )
    cfg = dataclasses.replace(cfg, name="sweep")
    monkeypatch.chdir(tmp_path)

    args = type("A", (), {"corruption": "gaussian_noise", "seed": 0})
    pipe, results = run_corruption_sweep(cfg, args, severities=(1, 2))

    assert set(results) == {("gaussian_noise", 1), ("gaussian_noise", 2)}
    for (name, sev), stats in results.items():
        assert stats["images"] == 2
        out = tmp_path / "vis_hp" / "synth" / f"sweep_corrupt_{name}_s{sev}"
        assert (out / "dewarped_pred").is_dir()
        assert len(list((out / "dewarped_pred").glob("warped_*.png"))) == 2
    # the hoisted jitted stages compiled exactly once across combos
    assert pipe._stage_jits is not None
    cond_jit, sample_jit = pipe._stage_jits
    assert cond_jit._cache_size() == 1
    assert sample_jit._cache_size() == 1
