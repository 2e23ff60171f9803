"""Alternative denoiser families: shapes, registry, and end-to-end
train/serve reachability through the train_mode dispatch."""

import os

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
    "sr", "trg_feat",
])
def test_registry_builds_every_mode(mode):
    cfg = default_config().replace(
        model={"train_mode": mode, "image_size": S, "source_size": 128,
               "compute_dtype": "float32"})
    model, sched = create_model_and_diffusion(cfg)
    assert sched.num_timesteps == 3
    assert model is not None


@pytest.mark.parametrize("mode,extra_ch", [("sr", 0), ("trg_feat", 64)])
def test_sr_trg_feat_variants_callable(mode, extra_ch):
    """sr: concat[x, init_flow, local_corr] = 85ch (unet.py:441-461);
    trg_feat: + l2norm(trg_feat) = 149ch (script_util.py:168-170)."""
    from dvd_tpu.models.unet_denoiser import UNetDenoiser

    in_ch = 2 + 2 + 81 + extra_ch
    m = UNetDenoiser(in_channels=in_ch, model_channels=32, num_res_blocks=1,
                     attention_ds=(4, 8), num_heads=2, train_mode=mode)
    d = _common()
    kw = dict(init_flow=d["init_flow"],
              local_corr=0.1 * jax.random.normal(
                  jax.random.PRNGKey(3), (2, S, S, 81)))
    if mode == "trg_feat":
        kw["trg_feat"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(4), (2, S, S, 64))
    v = m.init(jax.random.PRNGKey(0), d["x"], d["t"], **kw)
    out = m.apply(v, d["x"], d["t"], **kw)
    assert out.shape == (2, S, S, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("mode", ["sr", "trg_feat"])
def test_undrivable_modes_rejected_loudly(mode):
    """sr/trg_feat are constructible (script_util parity) but neither
    driver can condition them — both must refuse, not silently build the
    wrong model."""
    from dvd_tpu.evaluation.pipeline import DewarpPipeline
    from dvd_tpu.training.train_state import make_optimizer, make_train_step

    cfg = _alt_cfg(mode)
    with pytest.raises(NotImplementedError, match="drivable"):
        DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))
    model, sched = create_model_and_diffusion(cfg)
    with pytest.raises(NotImplementedError, match="drivable"):
        make_train_step(cfg, sched, model.apply, make_optimizer(cfg))


# ---------------------------------------------------------------------------
# End-to-end reachability (VERDICT r3 missing #2): every alt family must
# train through the registry-dispatched train step (plain masked MSE,
# reference train_util.py:350-366 / gaussian_diffusion.py:1062-1102) and
# serve through the DewarpPipeline DDIM stages.
# ---------------------------------------------------------------------------

ALT_MODES = ["stage_1", "stage_1_transformer", "stage_1_doctr"]


def _alt_cfg(mode, tmp_path=None):
    over = {
        "model": {"train_mode": mode, "image_size": S, "source_size": 128,
                  "perception_size": 64, "compute_dtype": "float32",
                  "train_VGG": False, "num_channels": 32,
                  "num_res_blocks": 1, "num_heads": 2,
                  "attention_resolutions": "8,4"},
        "train": {"microbatch": 0, "log_interval": 1, "save_interval": 100},
    }
    if tmp_path is not None:
        over["paths"] = {"workspace_dir": str(tmp_path)}
    return default_config().replace(**over)


@pytest.mark.parametrize("mode", ALT_MODES)
def test_alt_train_step(mode):
    from dvd_tpu.training.train_state import (create_train_state,
                                              make_optimizer, make_train_step)

    cfg = _alt_cfg(mode)
    model, sched = create_model_and_diffusion(cfg)
    d = _common()
    b = d["x"].shape[0]
    v = model.init(jax.random.PRNGKey(0), d["x"], d["t"],
                   src_feat=d["src_feat"], init_flow=d["init_flow"])
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, v, tx)
    step = jax.jit(make_train_step(cfg, sched, model.apply, tx))

    batch = {
        "flow64": 0.1 * jax.random.normal(jax.random.PRNGKey(1), (b, S, S, 2)),
        "mask": jnp.ones((b, 32, 32, 1)),
        "src_feat": d["src_feat"],
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0.0
    # at least one parameter leaf must actually move
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(bb))
        for a, bb in zip(jax.tree.leaves(state.params),
                         jax.tree.leaves(new_state.params)))
    assert moved, f"{mode}: optimizer step changed no parameters"


@pytest.mark.parametrize("mode", ALT_MODES)
def test_alt_pipeline_serving(mode):
    """DewarpPipeline honors train_mode: conditioning -> DDIM -> flow."""
    from dvd_tpu.evaluation.pipeline import DewarpPipeline

    cfg = _alt_cfg(mode).replace(diffusion={"n_batch": 2})
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))
    assert not pipe.is_dit
    src = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    flow = jax.jit(pipe.dewarp_flow)(src, jax.random.PRNGKey(2))
    assert flow.shape == (1, S, S, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_alt_mode_requires_external_vgg():
    from dvd_tpu.evaluation.pipeline import DewarpPipeline

    cfg = _alt_cfg("stage_1")
    cfg = cfg.replace(model={"train_VGG": True})
    with pytest.raises(ValueError, match="train_VGG"):
        DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))


@pytest.mark.slow
def test_alt_train_driver_e2e(tmp_path):
    """run_training's driver with --set model.train_mode=stage_1: the UNet
    demonstrably trains (build_device_batch produces the 64-ch src_feat,
    the dispatched plain-MSE step updates UNet params, checkpoint saved)."""
    from test_train_loop_e2e import synthetic_batches

    from dvd_tpu.training.train_loop import train
    from dvd_tpu.utils.logger import KVLogger

    cfg = _alt_cfg("stage_1", tmp_path)
    logger = KVLogger(str(tmp_path / "logs"), formats=("csv",))
    train(cfg, synthetic_batches(3), max_steps=2, logger=logger)
    ws = tmp_path / cfg.name
    assert any(d.startswith("state_") for d in os.listdir(ws))
