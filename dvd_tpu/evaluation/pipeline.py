"""End-to-end dewarping pipeline: aux perception nets -> conditioning ->
jitted DDIM -> native-resolution unwarp.

Replaces the reference's per-image Python driver
(``train_settings/dvd/evaluation.py:142-327``) with a batched, fully
on-device computation:

1. 512^2 source -> 288^2 (align_corners=True) for the perception nets
2. GeoTrSegInf: document mask (512^2, the ``mask_cat`` pyramid channel) and
   optional init flow (``use_init_flow``)
3. Seg (U2NetP): 6 decoder side features -> 384ch ``seg_map_all`` @ latent
4. TextLineUNet over the hard-masked image -> 64ch ``line_msk`` @ latent
5. DiT + DDIM (3 steps x n_batch hypotheses) -> 64^2 offset field
6. upsample to the original size and ``grid_sample`` unwarp with the
   ``((flow + base) * 2 - 1) * 0.987`` grid (reference ``evaluation.py:306``)

The native-size unwarp is shape-static: originals are padded into a fixed
(pad, pad) canvas and the true (H, W) enter as traced scalars, so arbitrary
benchmark image sizes reuse one compiled executable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvd_tpu.config import DvDConfig
from dvd_tpu.diffusion.sampler import ddim_sample_loop
from dvd_tpu.diffusion.schedule import DiffusionSchedule, make_schedule
from dvd_tpu.models.dit import DiT
from dvd_tpu.models.geotr import GeoTrSegInf
from dvd_tpu.models.textline_unet import TextLineUNet
from dvd_tpu.models.u2net import Seg, seg_pyramid_to_latent
from dvd_tpu.ops.grid_sample import auto_row_chunk, grid_sample
from dvd_tpu.ops.resize import resize_area, resize_bilinear
from dvd_tpu.utils.grids import UNWARP_SHRINK, base_grid


@dataclasses.dataclass
class DewarpPipeline:
    """Bundles the four networks + schedule; exposes jitted entry points."""

    cfg: DvDConfig
    dit: Any     # registry denoiser: the production DiT or an alt family
    seg: Seg
    line: TextLineUNet
    geotr: GeoTrSegInf
    sched: DiffusionSchedule

    dit_vars: Any = None
    seg_vars: Any = None
    line_vars: Any = None
    geotr_vars: Any = None
    vgg: Any = None                      # VGG16Pyramid (train_VGG=False)
    vgg_vars: Any = None

    @classmethod
    def create(cls, cfg: DvDConfig, rng: Optional[jax.Array] = None,
               init_aux: bool = True) -> "DewarpPipeline":
        m = cfg.model
        # the denoiser family comes from the registry's train_mode switch
        # (reference script_util.py:93-203) — the production DiT or one of
        # the alternative families (stage_1 UNet / stage_1_transformer /
        # stage_1_doctr), all servable through the same DDIM stages
        from dvd_tpu.models.registry import (
            check_driver_mode, create_model, is_dit_mode)

        check_driver_mode(m.train_mode)
        if not is_dit_mode(m.train_mode) and m.train_VGG:
            raise ValueError(
                f"train_mode={m.train_mode!r} needs the external VGG "
                "conditioning features (the reference's "
                "extract_raw_features_single, eval_utils.py:148); set "
                "model.train_VGG=False")
        dit = create_model(cfg)
        sched = make_schedule(
            steps=cfg.diffusion.diffusion_steps,
            schedule_name=cfg.diffusion.noise_schedule,
            respacing=cfg.diffusion.timestep_respacing,
            rescale_timesteps=cfg.diffusion.rescale_timesteps,
        )
        cdt = jnp.dtype(m.compute_dtype) if m.compute_dtype != "float32" \
            else jnp.float32
        pipe = cls(cfg=cfg, dit=dit,
                   seg=Seg(mask_size=m.source_size, dtype=cdt),
                   line=TextLineUNet(dtype=cdt),
                   geotr=GeoTrSegInf(mask_size=m.source_size, dtype=cdt),
                   sched=sched)
        if rng is not None:
            pipe.init_params(rng, init_aux=init_aux)
        return pipe

    @property
    def is_dit(self) -> bool:
        return isinstance(self.dit, DiT)

    # ---------------------------------------------------------------- init
    def init_params(self, rng: jax.Array, init_aux: bool = True) -> None:
        s = self.cfg.model.image_size
        src = self.cfg.model.source_size
        per = self.cfg.model.perception_size
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        if not self.is_dit:
            # alternative denoisers: (x, t, src_feat 64ch, init_flow)
            self.dit_vars = jax.jit(self.dit.init)(
                k1, jnp.zeros((1, s, s, 2)), jnp.zeros((1,)),
                src_feat=jnp.zeros((1, s, s, 64)),
                init_flow=jnp.zeros((1, s, s, 2)))
            if init_aux:
                self._init_aux(k2, k3, k4)
            return
        dummy = {
            "x": jnp.zeros((1, s, s, 2)),
            "t": jnp.zeros((1,)),
            "y512": jnp.zeros((1, src, src, 3)),
            "mask_cat": jnp.zeros((1, src, src, 1)),
            "mask_y512": jnp.zeros((1, s, s, 384)),
            "line_msk": jnp.zeros((1, s, s, 64)),
            "init_flow": jnp.zeros((1, s, s, 2)),
            "init_feat": jnp.zeros((1, s, s, 256)),
        }
        m = self.cfg.model
        # stream count (and decoder width) depends on the conditioning
        # flags, so init with the same optional inputs apply will see
        self.dit_vars = jax.jit(
            functools.partial(self.dit.init, remap_timesteps=False)
        )(
            k1, dummy["x"], dummy["t"], y512=dummy["y512"],
            mask_cat=dummy["mask_cat"],
            mask_y512=None if m.use_gt_mask else dummy["mask_y512"],
            line_msk=dummy["line_msk"]
            if (m.use_line_mask and not m.use_gt_mask) else None,
            src_feat=None if m.train_VGG else jnp.zeros((1, s, s, 256)),
            init_flow=dummy["init_flow"],
            init_feat=dummy["init_feat"],
        )
        if init_aux:
            self._init_aux(k2, k3, k4)

    def _init_aux(self, k2, k3, k4) -> None:
        src = self.cfg.model.source_size
        per = self.cfg.model.perception_size
        img288 = jnp.zeros((1, per, per, 3))
        if self.is_dit:
            # alt families never consume the seg pyramid / line features
            # (conditioning_impl's alt branch) — skip their init entirely,
            # and GeoTr matters to them only as the init_flow seed
            self.seg_vars = jax.jit(self.seg.init)(k2, img288)
            self.line_vars = jax.jit(self.line.init)(k3, img288)
        if self.is_dit or self.cfg.model.use_init_flow:
            self.geotr_vars = jax.jit(self.geotr.init)(k4, img288)
        if not self.cfg.model.train_VGG:
            from dvd_tpu.models.vgg import VGG16Pyramid

            self.vgg = VGG16Pyramid()
            self.vgg_vars = jax.jit(
                functools.partial(self.vgg.init, mode="eigth")
            )(jax.random.fold_in(k4, 1),
              jnp.zeros((1, src, src, 3)))

    # ------------------------------------------------------------- adapter
    def make_dit_fn(self, dit_vars):
        """ModelFn adapter for the sampler.  ``dit_vars`` must be a traced
        jit argument at the call site — closing over concrete variables
        would bake ~10^8 weights into the HLO as literal constants (which
        blows past remote-compile request limits and defeats the
        persistent cache)."""

        if not self.is_dit:
            # alternative families (reference unet-era convention): no
            # recurrent features, no timestep remap; SpacedDiffusion's
            # rescaled t arrives via the sampler's G.model_t
            def alt_fn(x, t, cond, *, init_flow, init_feat, seed_init_feat,
                       remap_timesteps):
                out = self.dit.apply(dit_vars, x, t,
                                     src_feat=cond["src_feat"],
                                     init_flow=init_flow)
                if isinstance(out, tuple):
                    out = out[0]
                return out, init_feat

            return alt_fn

        def dit_fn(x, t, cond, *, init_flow, init_feat, seed_init_feat,
                   remap_timesteps):
            return self.dit.apply(
                dit_vars, x, t,
                y512=cond["y512"], mask_cat=cond.get("mask_cat"),
                mask_y512=cond.get("mask_y512"),
                line_msk=cond.get("line_msk"),
                src_feat=cond.get("src_feat"),
                cond_tokens=cond.get("cond_tokens"),
                msk6_tokens=cond.get("msk6_tokens"),
                line_tokens=cond.get("line_tokens"),
                init_flow=init_flow, init_feat=init_feat,
                seed_init_feat=seed_init_feat,
                remap_timesteps=remap_timesteps,
            )

        return dit_fn

    # -------------------------------------------------------- conditioning
    def conditioning_impl(self, aux_vars, source512: jnp.ndarray):
        """source512: (B, 512, 512, 3) float in [0, 1] -> conditioning dict
        + zero-initialized recurrent state (reference evaluation.py:160-263).

        ``aux_vars = (seg_vars, line_vars, geotr_vars, vgg_vars)`` passed
        as traced arguments (see make_dit_fn note); ``vgg_vars`` is None
        unless ``train_VGG=False``.

        ``model.serve_cond_chunk`` > 0 runs the aux stack in sub-batches
        of that size via ``lax.map``: the stack is HBM-bound and XLA's
        conv code streams near peak bandwidth at batch 4 but degrades at
        8-16 (docs/COND_PROFILE.json), so chunking keeps large serving
        batches in the sweet spot.  Same per-sample math (conv reduction
        order may differ across batch shapes; ~1e-6)."""
        chunk = self.cfg.model.serve_cond_chunk
        b = source512.shape[0]
        if chunk and b > chunk and b % chunk == 0:
            xs = source512.reshape((b // chunk, chunk)
                                   + tuple(source512.shape[1:]))
            out = jax.lax.map(
                lambda s: self._conditioning_chunk(aux_vars, s), xs)
            return jax.tree.map(
                lambda t: t.reshape((b,) + tuple(t.shape[2:])), out)
        return self._conditioning_chunk(aux_vars, source512)

    def _planar_enabled(self) -> bool:
        """Planar-layout aux-net serving (see ``models/planar_aux.py``):
        "auto" turns it on exactly where it pays — the TPU backend, where
        NHWC small-channel conv tensors are lane-padded up to 8x."""
        mode = getattr(self.cfg.model, "planar_aux", "off")
        if mode == "on":
            return True
        if mode != "auto":
            return False
        from dvd_tpu.ops.pallas import planar_conv

        return planar_conv.supports()

    def _conditioning_chunk(self, aux_vars, source512: jnp.ndarray):
        seg_vars, line_vars, geotr_vars, vgg_vars = aux_vars
        s = self.cfg.model.image_size
        per = self.cfg.model.perception_size
        b = source512.shape[0]
        src288 = resize_bilinear(source512, (per, per), align_corners=True)
        if self.is_dit and self._planar_enabled():
            return self._conditioning_chunk_planar(
                aux_vars, source512, src288)

        if not self.is_dit:
            # alternative denoisers consume only the 64-ch VGG feature
            # plane (extract_raw_features_single, eval_utils.py:148) + the
            # optional GeoTr init flow — no seg/line streams to compute,
            # and GeoTr runs only when its flow is actually consumed
            from dvd_tpu.models.vgg import c20_for_unet

            feats = self.vgg.apply(vgg_vars, source512, mode="eigth")
            cond = {"src_feat": c20_for_unet(feats, s)}
            if self.cfg.model.use_init_flow:
                ref_bm, _ = self.geotr.apply(geotr_vars, src288)
                ref_flow = ref_bm.astype(jnp.float32) / (per - 1.0)
                init_flow = resize_bilinear(ref_flow, (s, s),
                                            align_corners=True)
            else:
                init_flow = jnp.zeros((b, s, s, 2), jnp.float32)
            return cond, init_flow, jnp.zeros((b, s, s, 256), jnp.float32)

        ref_bm, mask512 = self.geotr.apply(geotr_vars, src288)
        cond = {"y512": source512, "mask_cat": mask512}

        mskx, _, hx6, hx5d, hx4d, hx3d, hx2d, hx1d = self.seg.apply(
            seg_vars, src288)
        if not self.cfg.model.use_gt_mask:
            # seg pyramid + text-line conditioning (evaluation.py:200-216);
            # with use_gt_mask=True the reference passes neither
            cond["mask_y512"] = seg_pyramid_to_latent(
                (hx6, hx5d, hx4d, hx3d, hx2d, hx1d), s)
            if self.cfg.model.use_line_mask:
                line_feat, _ = self.line.apply(line_vars, mskx)
                cond["line_msk"] = resize_bilinear(
                    line_feat, (s, s), align_corners=False)

        if not self.cfg.model.train_VGG:
            # external torchvision-VGG conditioning (evaluation.py:224-236)
            from dvd_tpu.models.vgg import c20_for_dit

            feats = self.vgg.apply(vgg_vars, source512, mode="eigth")
            cond["src_feat"] = c20_for_dit(feats, s)
        if self.cfg.model.use_init_flow:
            # seed the residual stream with GeoTr's coarse offsets
            # (reference evaluation.py:176-179: ref_flow = ref_bm/287,
            # bilinear to the latent size; zeros in the shipped config)
            ref_flow = ref_bm.astype(jnp.float32) / (per - 1.0)
            init_flow = resize_bilinear(ref_flow, (s, s), align_corners=True)
        else:
            init_flow = jnp.zeros((b, s, s, 2), jnp.float32)
        init_feat = jnp.zeros((b, s, s, 256), jnp.float32)
        return cond, init_flow, init_feat

    def _conditioning_chunk_planar(self, aux_vars, source512, src288):
        """Planar-layout conditioning (production DiT config): the same
        stages as :meth:`_conditioning_chunk`'s DiT branch, with the
        U2NetP x2 + line-UNet forwards running through the planar Pallas
        conv stack (``models/planar_aux.py``; parity tested there and in
        test_pipeline_e2e.py).  Falls back per-component: when
        ``use_init_flow`` needs GeoTr's transformer output (dead in the
        shipped config, reference ``local.py:87``), GeoTr runs NHWC."""
        from dvd_tpu.models import planar_aux as pa

        seg_vars, line_vars, geotr_vars, vgg_vars = aux_vars
        m = self.cfg.model
        s = m.image_size
        per = m.perception_size
        b = source512.shape[0]
        hw = (per, per)
        # the flax modules cast to the compute dtype inside each conv;
        # planar casts once at entry (same bf16 stream between layers)
        x_pl = pa.to_planar(src288).astype(self.seg.dtype)

        if m.use_init_flow:
            ref_bm, mask512 = self.geotr.apply(geotr_vars, src288)
            ref_flow = ref_bm.astype(jnp.float32) / (per - 1.0)
            init_flow = resize_bilinear(ref_flow, (s, s),
                                        align_corners=True)
        else:
            mask512 = pa.geotr_mask_planar(
                geotr_vars, x_pl, hw, m.source_size)
            init_flow = jnp.zeros((b, s, s, 2), jnp.float32)
        cond = {"y512": source512, "mask_cat": mask512}

        if not m.use_gt_mask:
            mskx_pl, _, pyr = pa.seg_planar(
                seg_vars, x_pl, hw, m.source_size)
            cond["mask_y512"] = pa.seg_pyramid_to_latent_planar(pyr, s)
            if m.use_line_mask:
                line_pl, _ = pa.textline_planar(line_vars, mskx_pl, hw)
                cond["line_msk"] = pa.from_planar(
                    pa.resize_planar(line_pl, hw, (s, s),
                                     align_corners=False), (s, s))

        if not m.train_VGG:
            from dvd_tpu.models.vgg import c20_for_dit

            feats = self.vgg.apply(vgg_vars, source512, mode="eigth")
            cond["src_feat"] = c20_for_dit(feats, s)
        init_feat = jnp.zeros((b, s, s, 256), jnp.float32)
        return cond, init_flow, init_feat

    def sampling_impl(self, dit_vars, cond, init_flow, init_feat, rng,
                      init_noise=None):
        """Diffusion stage (conditioning precomputed).  ``init_noise``
        optionally pins the x_T draw (parity tests)."""
        tv = self.is_dit and bool(self.cfg.model.time_variant)
        if self.is_dit:
            cond = self._hoist_pyramid(dit_vars, cond)
            cond = self._hoist_stream_tokens(dit_vars, cond)
        result = ddim_sample_loop(
            self.make_dit_fn(dit_vars), self.sched, cond, init_flow,
            init_feat if tv else None,
            rng=rng,
            latent_size=self.cfg.model.image_size,
            n_batch=self.cfg.diffusion.n_batch,
            time_variant=tv,
            eta=self.cfg.diffusion.eta,
            clip_denoised=self.cfg.diffusion.clip_denoised,
            init_noise=init_noise,
        )
        return result.flow

    def _hoist_pyramid(self, dit_vars, cond):
        """Hoist the DiT's private conditioning pyramid out of the DDIM
        loop.  Its input (``y512`` [+ ``mask_cat``]) is constant across the
        T steps and the n_batch hypotheses, so the reference recomputes the
        same 512^2 conv stack T*n_batch times per image
        (``cross_model.py:586-594`` runs inside every denoiser call).
        Computing it once here and feeding it through the ``src_feat``
        bypass (the same code path the external-VGG conditioning uses) is
        bit-identical: the DiT consumes it for the cond stream, the
        ``seed_init_feat`` seeding, and the returned recurrent features.
        Measured ~45 ms/call at an effective batch of 16 on v5e — 5 of 6
        calls saved."""
        if cond.get("src_feat") is not None:   # external VGG already given
            return cond
        out = dict(cond)
        s = self.cfg.model.image_size
        if self._planar_enabled() and s == 64:
            # planar pyramid (4-ch 512^2 input: 32x lane-padded in NHWC);
            # same math, f32 accumulation — ~1ulp vs the in-model path
            # rather than bit-identical (test_pipeline_e2e.py bounds it)
            from dvd_tpu.models import planar_aux as pa

            y = cond["y512"] if cond.get("mask_cat") is None else \
                jnp.concatenate([cond["y512"], cond["mask_cat"]], -1)
            src = self.cfg.model.source_size
            out["src_feat"] = pa.pyramid_planar(
                dit_vars["params"]["pyramid"], pa.to_planar(y),
                (src, src), s, self.dit.dtype)
            return out
        from dvd_tpu.models.dit import conditioning_pyramid_features

        out["src_feat"] = conditioning_pyramid_features(
            dit_vars["params"]["pyramid"], cond["y512"],
            cond.get("mask_cat"), s, self.dit.dtype)
        return out

    def _hoist_stream_tokens(self, dit_vars, cond):
        """Hoist the step/hypothesis-invariant c/m/l patch embedders out of
        the DDIM loop (see ``dit.embed_stream_tokens``): T x n_batch
        embedder calls per image become one, and the (N, S, S, 384/64)
        raw streams never get hypothesis-tiled — only their (N, T, 384)
        token forms do (6x smaller for mask_y512), which also shrinks the
        scan-resident footprint at large batch."""
        if cond.get("src_feat") is None:  # non-production DiT variants
            return cond
        from dvd_tpu.models.dit import embed_stream_tokens

        out = dict(cond)
        out.update(embed_stream_tokens(
            self.dit, dit_vars["params"],
            feat=cond["src_feat"],
            mask_y512=out.pop("mask_y512", None),
            line_msk=out.pop("line_msk", None)))
        return out

    def build_conditioning(self, source512: jnp.ndarray):
        return self.conditioning_impl(
            (self.seg_vars, self.line_vars, self.geotr_vars,
             self.vgg_vars), source512)

    def dewarp_flow(self, source512: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """(B, 512, 512, 3) [0,1] -> (B, S, S, 2) offset field in [-1, 1]."""
        cond, init_flow, init_feat = self.build_conditioning(source512)
        return self.sampling_impl(self.dit_vars, cond, init_flow, init_feat, rng)

    def jitted_stages(self):
        """Separately-jitted (conditioning, sampling) stages with model
        variables as runtime arguments.  Returns callables bound to this
        pipeline's current variables.

        The jit wrappers are cached on the instance: jax keys its trace
        cache on the wrapper object, so a fresh ``jax.jit(bound_method)``
        per call would retrace both stages every time — which made the
        75-combo corruption sweep retrace 150 executables (VERDICT r3
        weak #5).  One pipeline now compiles each stage exactly once per
        shape."""
        if getattr(self, "_stage_jits", None) is None:
            self._stage_jits = (jax.jit(self.conditioning_impl),
                                jax.jit(self.sampling_impl))
        cond_jit, sample_jit = self._stage_jits

        def cond_fn(source512):
            return cond_jit((self.seg_vars, self.line_vars,
                             self.geotr_vars, self.vgg_vars),
                            source512)

        def sample_fn(cond, init_flow, init_feat, rng):
            return sample_jit(self.dit_vars, cond, init_flow, init_feat, rng)

        return cond_fn, sample_fn


# ---------------------------------------------------------------- unwarp
def unwarp_native(
    source_padded: jnp.ndarray,   # (B, P, P, C) original pixels, zero-padded
    hw: jnp.ndarray,              # (B, 2) true (H, W) per image
    flow: jnp.ndarray,            # (B, S, S, 2) offset field
    shrink: float = UNWARP_SHRINK,
    batch_divisor: int = 1,       # data-mesh size: B is the *global* batch
    # at trace time, but transients are per-device — size row chunks to
    # the per-shard batch or the lax.map serializes devices x too finely
    mesh=None,                    # data mesh when the batch is sharded:
    # pallas_call has no SPMD partitioning rule, so the Pallas gathers
    # must run per-shard via shard_map (batch-pointwise -> exact)
) -> jnp.ndarray:
    """Native-resolution unwarp inside a fixed (P, P) canvas.

    Equivalent to the reference post-processing (``evaluation.py:300-318``):
    bilinear-upsample the flow to (H, W) with align_corners=True, build the
    sampling grid ``((flow + base) * 2 - 1) * shrink``, and grid_sample the
    original image.  (H, W) are traced scalars, so one compilation serves
    every benchmark image size; pixels beyond (H, W) are don't-care.
    """
    b, p, _, c = source_padded.shape
    nb = max(1, b // max(1, batch_divisor))  # per-device batch for chunking
    h = hw[:, 0].astype(jnp.float32)[:, None, None]
    w = hw[:, 1].astype(jnp.float32)[:, None, None]

    ii = jnp.arange(p, dtype=jnp.float32)[None, :, None]  # row idx
    jj = jnp.arange(p, dtype=jnp.float32)[None, None, :]  # col idx

    from dvd_tpu.ops.pallas import grid_sample as pgs

    def pallas_ok(img, grd):
        return pgs.supports(img.shape, grd.shape) and (
            mesh is None or img.shape[0] % pgs.batch_shards(mesh) == 0)

    def pallas_gs(img, grd, padding_mode):
        f = lambda i, g: pgs.grid_sample_pallas(i, g,
                                                padding_mode=padding_mode)
        if mesh is not None:
            f = pgs.shard_batch0(f, mesh, n_in=2)
        return f(img, grd)

    # upsample flow to the native size — bilinear on a REGULAR grid with
    # traced per-image (h, w), so it is separable: two small dynamic-
    # weight matmuls instead of a gather.  (The gather formulation used
    # before cost 2 GB of 64x-lane-padded [P^2, 2] temps per corner at a
    # 2048^2 batch-4 canvas and OOM'd — docs/STAGE_PROFILE_hires.json;
    # the matmul form is exact: identical clamp + bilinear weights.)
    s = flow.shape[1]
    r = jnp.arange(s, dtype=jnp.float32)
    # align_corners=True source position of output row i / col j in flow
    # pixels, border-clamped (matches padding_mode="border")
    src_y = jnp.clip(ii[0, :, 0][None] * (s - 1.0) / (h[:, 0:1, 0] - 1.0),
                     0.0, s - 1.0)                     # (B, P)
    src_x = jnp.clip(jj[0, 0][None] * (s - 1.0) / (w[:, 0:1, 0] - 1.0),
                     0.0, s - 1.0)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(src_y[:, :, None] - r))  # (B,P,s)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(src_x[:, :, None] - r))
    flow_native = jnp.einsum("bpr,brqc->bpqc", wy, flow)
    flow_native = jnp.einsum("bqs,bpsc->bpqc", wx, flow_native)

    base_x = jj / (w - 1.0)
    base_y = ii / (h - 1.0)
    samp_x = ((flow_native[..., 0] + base_x) * 2.0 - 1.0) * shrink
    samp_y = ((flow_native[..., 1] + base_y) * 2.0 - 1.0) * shrink

    # map [-1,1]-in-(H,W) coordinates into the padded canvas:
    # pixel = (samp+1)/2*(size-1); canvas-normalized = 2*pixel/(P-1)-1
    px = (samp_x + 1.0) * (w - 1.0) / (p - 1.0) - 1.0
    py = (samp_y + 1.0) * (h - 1.0) / (p - 1.0) - 1.0
    canvas_grid = jnp.stack([px, py], axis=-1)
    if pallas_ok(source_padded, canvas_grid):
        # VMEM-resident Pallas gather: 4.7x XLA's gather on v5e and no
        # output-sized HBM transients (tools/gather_probe.py)
        return pallas_gs(source_padded, canvas_grid, "zeros")
    # row-tiled gather: bounds the canvas-sized corner transients (a
    # 2048^2 batch of 8 used to peak ~2 GB and OOM) — see grid_sample.py
    return grid_sample(source_padded, canvas_grid, align_corners=True,
                       padding_mode="zeros",
                       row_chunk=auto_row_chunk(nb, p, p, c))


def unwarp_fixed(source: jnp.ndarray, flow: jnp.ndarray,
                 shrink: float = UNWARP_SHRINK) -> jnp.ndarray:
    """Unwarp at the source's own (static) resolution."""
    from dvd_tpu.ops.pallas import grid_sample as pgs

    h, w = source.shape[1:3]
    flow_hw = resize_bilinear(flow, (h, w), align_corners=True)
    g = (flow_hw + base_grid(h, w, flow_hw.dtype)) * 2.0 - 1.0
    g = g * shrink
    if pgs.supports(source.shape, g.shape):
        mesh = pgs.ambient_mesh()   # sharded-batch traces: run per-shard
        if mesh is None:
            return pgs.grid_sample_pallas(source, g, padding_mode="zeros")
        if source.shape[0] % pgs.batch_shards(mesh) == 0:
            f = lambda i, gg: pgs.grid_sample_pallas(i, gg,
                                                     padding_mode="zeros")
            return pgs.shard_batch0(f, mesh, n_in=2)(source, g)
    return grid_sample(source, g, align_corners=True, padding_mode="zeros")
