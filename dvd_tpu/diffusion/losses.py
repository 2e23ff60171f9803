"""Training losses for the coordinate-denoising diffusion.

The reference carries four loss variants (``gaussian_diffusion.py:833-1102``).
Variant map:

- ``training_losses_time_variant`` (``:890-1006``) -> :func:`time_variant_loss`
- ``training_losses_new_dit``       (``:1009-1059``) -> :func:`composed_warp_loss`
- ``training_losses_new``           (``:833-882``)  -> :func:`composed_warp_loss`
  (same composed masked MSE; the only deltas are the UNet-era scaled
  timesteps and kwargs-carried init states, both handled by the caller)
- ``training_losses``               (``:1062-1102``) -> :func:`plain_masked_mse`

The two live-from-entry-point paths:

- :func:`time_variant_loss` — the production path (``iter=True``,
  ``training_losses_time_variant``, ``:890-1006``): per-sample partial DDIM
  rollout synthesizes the recurrent ``init_flow``/``init_feat``, then one
  supervised model call with the warp-composed masked MSE.  The reference's
  rollout is a *sequential per-sample Python loop* of single-image model
  calls — here it's the vectorized batch rollout from
  ``dvd_tpu.diffusion.sampler.rollout_states_for_training``.
- :func:`composed_warp_loss` — the no-rollout DiT path (``iter=False``,
  ``training_losses_new_dit``, ``:1009-1059``).

Loss normalization is ``sum((target - f_new)^2) / sum(mask)`` over the
512^2-upsampled field, exactly as the reference (``:996-1002``).

Space conventions (see SURVEY.md §7 "hard parts"): the diffusion state is
``(offset + base) * 2 - 1`` (the normalized backward map in [-1, 1]) while
the model's *output* is an offset field; the composed warp
``f_new = warp(f_inter_pm, (out + base) * 2 - 1)`` ties them together.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dvd_tpu.diffusion import gaussian as G
from dvd_tpu.diffusion.sampler import ModelFn, rollout_states_for_training
from dvd_tpu.diffusion.schedule import DiffusionSchedule
from dvd_tpu.ops.grid_sample import warp, warp_const_src
from dvd_tpu.ops.resize import resize_bilinear
from dvd_tpu.utils.grids import base_grid


def _composed_terms(
    sched: DiffusionSchedule,
    x_start_pm: jnp.ndarray,       # (B, S, S, 2) state-space GT
    model_output: jnp.ndarray,     # (B, S, S, 2) predicted offsets
    f_inter_pm: jnp.ndarray,       # (B, H, H, 2) intermediate bm, pm space
    mask: jnp.ndarray,             # (B, H, H, 1)
) -> Dict[str, jnp.ndarray]:
    h = mask.shape[1]
    target = resize_bilinear(x_start_pm, (h, h), align_corners=True) * mask
    out512 = resize_bilinear(model_output, (h, h), align_corners=True) * mask
    f_pred = (out512 + base_grid(h, h, out512.dtype)) * 2.0 - 1.0
    # f_inter is ground truth — warp_const_src runs the 512^2 gather and
    # its grid-gradient as Pallas kernels on TPU (the XLA formulation
    # costs ~60 ms/step at batch 8, docs/TRAIN_PROFILE.json)
    f_new = warp_const_src(f_inter_pm, f_pred)
    # scalar loss is reference-exact (sum over the batch / sum of mask,
    # ``:1001``); mse_per is the per-sample decomposition used for the
    # loss-aware sampler history and quartile diagnostics
    num = jnp.sum((target - f_new) ** 2, axis=(1, 2, 3))
    den_per = jnp.sum(mask, axis=(1, 2, 3))
    mse = jnp.sum(num) / jnp.sum(den_per)
    return {"mse": mse, "loss": mse,
            "mse_per": num / jnp.maximum(den_per, 1e-12)}


def composed_warp_loss(
    model_fn: ModelFn,
    sched: DiffusionSchedule,
    cond: Dict[str, jnp.ndarray],
    init_flow: jnp.ndarray,
    init_feat: Optional[jnp.ndarray],
    x_start: jnp.ndarray,          # (B, S, S, 2) GT offsets at latent res
    x_start_inter: jnp.ndarray,    # (B, H, H, 2) intermediate offsets @512
    mask: jnp.ndarray,             # (B, H, H) or (B, H, H, 1)
    t: jnp.ndarray,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """training_losses_new_dit (iter=False)."""
    s = x_start.shape[1]
    h = x_start_inter.shape[1]
    if mask.ndim == 3:
        mask = mask[..., None]
    x_start_pm = (x_start + base_grid(s, s, x_start.dtype)) * 2.0 - 1.0
    f_inter_pm = (x_start_inter + base_grid(h, h, x_start_inter.dtype)) * 2.0 - 1.0

    noise = jax.random.normal(rng, x_start_pm.shape, x_start_pm.dtype)
    x_t = G.q_sample(sched, x_start_pm, t, noise)
    model_output, _ = model_fn(
        x_t, t.astype(jnp.float32), cond,
        init_flow=init_flow, init_feat=init_feat,
        # no t==T-1 feature seeding here: the reference model seeds only
        # when iter==True (cross_model.py:596-601), and this is the
        # iter=False loss — a tv model trained through this path receives
        # r = [init_flow, init_feat-as-given], exactly as upstream
        seed_init_feat=None,
        remap_timesteps=False,
    )
    return _composed_terms(sched, x_start_pm, model_output, f_inter_pm, mask)


def time_variant_loss(
    model_fn: ModelFn,
    sched: DiffusionSchedule,
    cond: Dict[str, jnp.ndarray],
    init_flow: jnp.ndarray,
    init_feat: jnp.ndarray,
    x_start: jnp.ndarray,
    x_start_inter: jnp.ndarray,
    mask: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    rollout_remap: bool = False,
) -> Dict[str, jnp.ndarray]:
    """training_losses_time_variant (iter=True, production).

    The rollout runs under stop_gradient (the reference's rollout happens
    inside torch.no_grad) and its states are selected per sample by ``t``.
    The main supervised call then receives the raw compact timesteps
    (SpacedDiffusion does NOT wrap this path — reference ``:978`` passes
    ``t`` unscaled)."""
    s = x_start.shape[1]
    h = x_start_inter.shape[1]
    if mask.ndim == 3:
        mask = mask[..., None]
    x_start_pm = (x_start + base_grid(s, s, x_start.dtype)) * 2.0 - 1.0
    f_inter_pm = (x_start_inter + base_grid(h, h, x_start_inter.dtype)) * 2.0 - 1.0

    k_noise, k_roll = jax.random.split(rng)
    noise = jax.random.normal(k_noise, x_start_pm.shape, x_start_pm.dtype)
    x_t = G.q_sample(sched, x_start_pm, t, noise)

    init_flow_r, init_feat_r = rollout_states_for_training(
        model_fn, sched, cond, init_flow, init_feat, t,
        rng=k_roll, latent_size=s, remap_timesteps=rollout_remap,
    )

    model_output, _ = model_fn(
        x_t, t.astype(jnp.float32), cond,
        init_flow=init_flow_r, init_feat=init_feat_r,
        seed_init_feat=(t == sched.num_timesteps - 1),
        remap_timesteps=False,
    )
    return _composed_terms(sched, x_start_pm, model_output, f_inter_pm, mask)


def plain_masked_mse(
    model_fn: Callable,
    sched: DiffusionSchedule,
    cond: Dict[str, jnp.ndarray],
    x_start: jnp.ndarray,
    mask: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    **model_kwargs,
) -> Dict[str, jnp.ndarray]:
    """training_losses (plain masked MSE at 512^2, ``:1062-1102``) for the
    alternative denoisers; model timesteps are rescaled here (the reference
    routes this one through SpacedDiffusion's wrapper)."""
    if mask.ndim == 3:
        mask = mask[..., None]
    h = mask.shape[1]
    noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_t = G.q_sample(sched, x_start, t, noise)
    model_output = model_fn(x_t, G.model_t(sched, t), cond, **model_kwargs)
    if isinstance(model_output, tuple):
        model_output = model_output[0]
    target = resize_bilinear(x_start, (h, h), align_corners=True) * mask
    out = resize_bilinear(model_output, (h, h), align_corners=True) * mask
    num = jnp.sum((target - out) ** 2, axis=(1, 2, 3))
    den_per = jnp.sum(mask, axis=(1, 2, 3))
    mse = jnp.sum(num) / jnp.sum(den_per)
    return {"mse": mse, "loss": mse,
            "mse_per": num / jnp.maximum(den_per, 1e-12)}
