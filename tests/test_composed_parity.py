"""Composed serving-path parity against the reference evaluation driver.

Per-model parity exists (DiT <=1e-3, U2NETP <=2e-4, GeoTr 6e-6), but
nothing asserted that the *composed* inference path — 288^2 resize ->
GeoTr mask -> seg pyramid -> line feats -> 3-step DDIM x2 hypotheses with
recurrent re-warping -> upsample -> ``((flow+base)*2-1)*0.987`` unwarp —
matches the reference's ``run_evaluation_docunet``
(``train_settings/dvd/evaluation.py:142-327``).  A stacked resize /
ordering / align_corners mistake would pass every per-model test and
still break metric parity with real weights; this test catches it.

Method: re-randomize the reference's own torch nets (same technique as
test_dit_reference_parity), convert them with the production converter
rules, install into a ``DewarpPipeline`` on the shipped production
config, feed both frameworks the same image and the same x_T noise, and
compare every composed intermediate plus the final dewarped pixels.

The reference side executes the reference's *own* code for everything
that is importable (GaussianDiffusion DDIM loop, GeoTr_Seg_Inf, Seg,
line UNet, the final reg_model_bilin grid_sample); the few glue lines of
``run_evaluation_docunet`` / ``run_sample_lr_dewarping`` that cannot be
imported without torchvision/matplotlib are re-executed inline below with
file:line citations.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "train_settings")),
        reason="reference repo not mounted",
    ),
]

S = 64            # latent (evaluation.py:159 image_size = 64)
PER = 288         # perception resolution (evaluation.py:163)
SRC = 512
H_ORI, W_ORI = 400, 320
N_BATCH = 2


@pytest.fixture(scope="module")
def ref_env():
    """Import the reference stack with the parity-test stubs installed."""
    from test_dit_reference_parity import _install_timm_mmcv_stubs, _stub

    sys.path.insert(0, REF)
    import torch

    # torchvision stub: the reference's datasets/ package (pulled in by
    # gaussian_diffusion's register_model2 import) needs transforms too
    class InterpolationMode:
        NEAREST, BILINEAR = "nearest", "bilinear"
        BICUBIC, LANCZOS = "bicubic", "lanczos"

    utils = _stub("torchvision.utils", save_image=lambda *a, **k: None)
    tff = _stub("torchvision.transforms.functional",
                InterpolationMode=InterpolationMode)
    tf = _stub("torchvision.transforms", functional=tff,
               InterpolationMode=InterpolationMode,
               Compose=lambda fs: fs)
    _stub("torchvision", utils=utils, transforms=tf)
    _stub("blobfile", BlobFile=open)
    mpi = _stub("mpi4py.MPI")

    class _Comm:
        def Get_rank(self):
            return 0

        def Get_size(self):
            return 1

        def bcast(self, x, root=0):
            return x

    mpi.COMM_WORLD = _Comm()
    _stub("mpi4py", MPI=mpi)
    _install_timm_mmcv_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self  # geotr_core.py:529

    from train_settings.dvd.improved_diffusion import script_util
    from train_settings.models.geotr import geotr_core
    from train_settings.models.geotr.unet_model import UNet

    return script_util, geotr_core, UNet


@pytest.fixture(scope="module")
def models(ref_env):
    """(torch models, converted flax pipeline) on the production config."""
    import jax
    import torch

    from test_dit_reference_parity import _rerandomize

    from dvd_tpu.config import default_config
    from dvd_tpu.evaluation.pipeline import DewarpPipeline
    from dvd_tpu.training import convert as C

    script_util, geotr_core, UNet = ref_env

    torch.manual_seed(0)
    t_dit = script_util.create_model(
        image_size=256, num_channels=128, num_res_blocks=2, learn_sigma=False,
        class_cond=False, use_checkpoint=False, attention_resolutions="16,8",
        num_heads=4, num_heads_upsample=-1, use_scale_shift_norm=True,
        dropout=0.0, device="cpu", train_mode="stage_1_dit_cross", tv=True,
    ).eval()                                     # script_util.py:155-162
    _rerandomize(t_dit, seed=0)
    t_geotr = geotr_core.GeoTr_Seg_Inf().eval()  # val_TDiff.py:59
    t_seg = geotr_core.Seg().eval()              # val_TDiff.py:67
    t_line = UNet(n_channels=3, n_classes=1).eval()  # val_TDiff.py:65

    # the shipped production config: DiT-S/2, latent 64, T=3 cosine,
    # tv/iter on, n_batch 2, use_line_mask on, train_VGG on (private
    # pyramid), use_init_flow off, clip_denoised off.  compute_dtype is
    # pinned to f32: the torch reference computes in f32, and the bf16
    # serving policy is a documented TPU deviation, not a math change —
    # this test isolates the composed MATH.
    cfg = default_config().replace(model={"compute_dtype": "float32"})
    assert cfg.diffusion.diffusion_steps == 3 and cfg.diffusion.n_batch == 2
    pipe = DewarpPipeline.create(cfg)            # no init: converted vars
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    pipe.dit_vars = C.convert_state_dict(sd(t_dit), C.DIT_RULES)
    pipe.geotr_vars = C.convert_state_dict(sd(t_geotr), C.GEOTR_SEG_RULES)
    pipe.seg_vars = C.convert_state_dict(sd(t_seg), C.U2NETP_RULES)
    pipe.line_vars = C.convert_state_dict(sd(t_line), C.LINE_UNET_RULES)

    diffusion = script_util.create_gaussian_diffusion(
        steps=cfg.diffusion.diffusion_steps,
        noise_schedule=cfg.diffusion.noise_schedule,
        predict_xstart=True, rescale_timesteps=True,
        rescale_learned_sigmas=True, timestep_respacing="",
    )                                            # val_TDiff.py:46-51
    return (t_dit, t_geotr, t_seg, t_line, diffusion), pipe


def _smooth_image(h, w, seed):
    """Low-gradient test page: pixel parity then tracks flow parity
    without edge-amplification (a 1e-3 grid error at a 255-step text edge
    would read as a ~40-gray-level pixel delta)."""
    import scipy.ndimage as ndi

    rng = np.random.RandomState(seed)
    img = ndi.gaussian_filter(rng.rand(h, w, 3) * 255, (6, 6, 0))
    return np.ascontiguousarray(img, np.float32)


def _reference_compose(tmods, src512, ori, noise_hyp, monkeypatch, tmp_path):
    """The reference inference math, evaluation.py:142-327 (torch CPU)."""
    import torch
    import torch.nn.functional as F

    t_dit, t_geotr, t_seg, t_line, diffusion = tmods
    nchw = lambda a: torch.from_numpy(
        np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2))))

    # the iter-branch sampler dumps per-step debug PNGs
    # (gaussian_diffusion.py:596-614) — give it a writable cwd
    monkeypatch.chdir(tmp_path)
    os.makedirs("vis_hp/debug_vis", exist_ok=True)

    # pin the x_T hypothesis draw (gaussian_diffusion.py:568)
    real_randn = torch.randn

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        if tuple(shape) == noise_hyp.shape:
            return torch.from_numpy(noise_hyp.copy())
        return real_randn(*shape, **kw)

    monkeypatch.setattr(torch, "randn", fake_randn)

    with torch.no_grad():
        source = nchw(src512)                                # 512^2 [0,1]
        # evaluation.py:163 — 288^2 perception resize
        source_288 = F.interpolate(source, size=PER, mode="bilinear",
                                   align_corners=True)
        init_feat = torch.zeros((1, 256, S, S))              # :169
        ref_bm, mask_x = t_geotr(source_288)                 # :174
        init_flow = torch.zeros((1, 2, S, S))                # :182 (no init)

        # :205-216 — seg pyramid (align_corners=False) + line stream
        mskx, d0, hx6, hx5d, hx4d, hx3d, hx2d, hx1d = t_seg(source_288)
        interp = lambda z: F.interpolate(z, size=S, mode="bilinear",
                                         align_corners=False)
        seg_map_all = torch.cat([interp(z) for z in
                                 (hx6, hx5d, hx4d, hx3d, hx2d, hx1d)], dim=1)
        textline_map, _ = t_line(mskx)
        textline_map = interp(textline_map)

        # run_sample_lr_dewarping, evaluation.py:105-139 (live lines):
        # c20=None under train_VGG (:228-230)
        model_kwsettings = {
            "init_flow": init_flow, "src_feat": None, "src_64": None,
            "y512": source, "tmode": "stage_1_dit_cross",
            "mask_cat": mask_x, "init_feat": init_feat, "iter": True,
            "mask_y512": seg_map_all, "line_msk": textline_map,
        }
        sample, _ = diffusion.ddim_sample_loop(
            t_dit, (1, 2, S, S), noise=None, clip_denoised=False,
            model_kwargs=model_kwsettings, eta=0.0, progress=False,
            denoised_fn=None, sampling_kwargs={"src_img": source},
            logger=None, n_batch=N_BATCH, time_variant=True, pyramid=None,
        )
        sample = torch.clamp(sample, min=-1, max=1)          # :139

        # :305-312 — upsample + base grid + 0.987 shrink.
        # coords_grid_tensor is defined identically in evaluation.py:330
        # and gaussian_diffusion.py:23; the latter avoids evaluation.py's
        # torchvision VGG import
        from train_settings.dvd.improved_diffusion.gaussian_diffusion import \
            coords_grid_tensor

        flow64 = sample.clone()
        sample = F.interpolate(sample, size=(H_ORI, W_ORI), mode="bilinear",
                               align_corners=True)
        base = F.interpolate(coords_grid_tensor((512, 512)) / 511.0,
                             size=(H_ORI, W_ORI), mode="bilinear",
                             align_corners=True)
        grid = ((sample + base) * 2 - 1) * 0.987

        # visualization_utils.py:75 — reg_model_bilin = grid_sample
        # (align_corners=True, zeros) over the ORIGINAL-size pixels
        from datasets.utils.warping import register_model2

        reg = register_model2((512, 512), "bilinear")
        out = reg([nchw(ori[None]).float(), grid])

    to_nhwc = lambda z: z.permute(0, 2, 3, 1).numpy()
    inter = {
        "mask_cat": to_nhwc(mask_x), "mask_y512": to_nhwc(seg_map_all),
        "line_msk": to_nhwc(textline_map), "flow": to_nhwc(flow64),
    }
    return inter, to_nhwc(out)


def test_composed_pipeline_parity(models, monkeypatch, tmp_path):
    import jax
    import jax.numpy as jnp

    from dvd_tpu.evaluation.pipeline import unwarp_native

    tmods, pipe = models
    ori = _smooth_image(H_ORI, W_ORI, seed=3)                # uint8-range
    import cv2

    # Doc_benchmark loading (doc_benchmark.py:68-82): cv2 resize to 512,
    # /255; the driver feeds the same arrays to both frameworks here, so
    # this test isolates the compute path (loader parity is test_doc_npz /
    # dataset tests)
    src512 = (cv2.resize(ori, (SRC, SRC)) / 255.0).astype(np.float32)[None]
    noise_hyp = np.random.RandomState(7).randn(
        N_BATCH, 2, S, S).astype(np.float32)

    ref_inter, ref_out = _reference_compose(
        tmods, src512, ori, noise_hyp, monkeypatch, tmp_path)

    # --- dvd_tpu side: the exact serving entry points ---
    cond, init_flow, init_feat = pipe.build_conditioning(jnp.asarray(src512))
    for key, atol in (("mask_cat", 5e-4), ("mask_y512", 5e-4),
                      ("line_msk", 5e-4)):
        np.testing.assert_allclose(
            np.asarray(cond[key]), ref_inter[key], atol=atol,
            err_msg=f"conditioning stream {key} diverged")
    assert float(np.abs(np.asarray(init_flow)).max()) == 0.0  # no init flow

    flow = pipe.sampling_impl(
        pipe.dit_vars, cond, init_flow, init_feat, jax.random.PRNGKey(0),
        init_noise=jnp.asarray(noise_hyp.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(flow), ref_inter["flow"], atol=5e-3,
        err_msg="3-step DDIM latent flow diverged")

    # native unwarp in the padded-canvas formulation (driver path)
    padded = np.zeros((1, SRC, SRC, 3), np.float32)
    padded[0, :H_ORI, :W_ORI] = ori
    hw = jnp.asarray([[H_ORI, W_ORI]], jnp.int32)
    out = np.asarray(unwarp_native(jnp.asarray(padded), hw,
                                   flow))[:, :H_ORI, :W_ORI]

    err = np.abs(out - ref_out)
    assert err.mean() < 0.5, f"dewarped pixels mean err {err.mean()}"
    assert np.quantile(err, 0.99) < 2.0, (
        f"dewarped pixels p99 err {np.quantile(err, 0.99)}")
