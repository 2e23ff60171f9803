"""Shape tests for the alternative denoiser families + registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.config import default_config
from dvd_tpu.models.registry import attention_ds, create_model_and_diffusion

S = 16


def _common(b=2):
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "x": 0.1 * jax.random.normal(k[0], (b, S, S, 2)),
        "t": jnp.array([1.0] * b),
        "src_feat": 0.1 * jax.random.normal(k[1], (b, S, S, 64)),
        "init_flow": 0.01 * jax.random.normal(k[2], (b, S, S, 2)),
    }


def test_attention_ds_parity():
    # reference: 64//16=4, 64//8=8 (script_util.py:164-168)
    assert attention_ds(64, "16,8") == (4, 8)


def test_unet_denoiser_shapes():
    from dvd_tpu.models.unet_denoiser import UNetDenoiser

    m = UNetDenoiser(in_channels=68, model_channels=32, num_res_blocks=1,
                     attention_ds=(4, 8), num_heads=2)
    d = _common()
    v = m.init(jax.random.PRNGKey(0), d["x"], d["t"],
               src_feat=d["src_feat"], init_flow=d["init_flow"])
    out = m.apply(v, d["x"], d["t"], src_feat=d["src_feat"],
                  init_flow=d["init_flow"])
    assert out.shape == (2, S, S, 2)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init output conv => identity to init_flow at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(d["init_flow"]),
                               atol=1e-5)


def test_transformer_denoiser_shapes():
    from dvd_tpu.models.transformer_denoiser import TransformerDenoiser

    m = TransformerDenoiser(model_channels=32, num_layers=1, ff_dim=64,
                            num_heads=2)
    d = _common()
    v = m.init(jax.random.PRNGKey(0), d["x"], d["t"],
               src_feat=d["src_feat"], init_flow=d["init_flow"])
    out = m.apply(v, d["x"], d["t"], src_feat=d["src_feat"],
                  init_flow=d["init_flow"])
    assert out.shape == (2, S, S, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_geotr2_denoiser_shapes():
    from dvd_tpu.models.geotr import GeoTr2

    m = GeoTr2(num_attn_layers=1, latent=S)
    d = _common()
    v = m.init(jax.random.PRNGKey(0), d["x"], d["t"],
               src_feat=d["src_feat"], init_flow=d["init_flow"])
    out, _ = m.apply(v, d["x"], d["t"], src_feat=d["src_feat"],
                     init_flow=d["init_flow"])
    assert out.shape == (2, S, S, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("mode", [
    "stage_1_dit_cross", "stage_1", "stage_1_transformer", "stage_1_doctr",
])
def test_registry_builds_every_mode(mode):
    cfg = default_config().replace(
        model={"train_mode": mode, "image_size": S, "source_size": 128,
               "compute_dtype": "float32"})
    model, sched = create_model_and_diffusion(cfg)
    assert sched.num_timesteps == 3
    assert model is not None
