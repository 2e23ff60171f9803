"""Gaussian diffusion math as pure functions over a DiffusionSchedule.

Covers the subset of the (public, MIT-licensed) improved-diffusion math the
DvD pipeline actually exercises — x0-parameterized prediction, FIXED_LARGE
variance, DDIM eta=0 updates — plus the epsilon parameterization for the
alternative denoisers.  Reference behavior: ``gaussian_diffusion.py:
250-268`` (q_sample), ``:294-415`` (p_mean_variance), ``:445-492``
(ddim_sample).

All functions are shape-polymorphic over trailing dims and jit/vmap-safe.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dvd_tpu.diffusion.schedule import DiffusionSchedule


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample from q(x_t | x_0)."""
    nd = x_start.ndim
    return (
        sched.gather(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + sched.gather(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean(
    sched: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    nd = x_t.ndim
    return (
        sched.gather(sched.posterior_mean_coef1, t, nd) * x_start
        + sched.gather(sched.posterior_mean_coef2, t, nd) * x_t
    )


def predict_xstart_from_eps(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    nd = x_t.ndim
    return (
        sched.gather(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - sched.gather(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray
) -> jnp.ndarray:
    nd = x_t.ndim
    return (
        sched.gather(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / sched.gather(sched.sqrt_recipm1_alphas_cumprod, t, nd)


class DDIMStep(NamedTuple):
    sample: jnp.ndarray      # x_{t-1}
    pred_xstart: jnp.ndarray


def ddim_step(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    pred_xstart: jnp.ndarray,
    *,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = False,
) -> DDIMStep:
    """One DDIM update (eq. 12) given the model's x0 prediction.

    Matches reference ``ddim_sample`` (``gaussian_diffusion.py:445-492``)
    with START_X parameterization.
    """
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
    nd = x_t.ndim
    eps = predict_eps_from_xstart(sched, x_t, t, pred_xstart)
    alpha_bar = sched.gather(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = sched.gather(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1.0 - alpha_bar_prev) / (1.0 - alpha_bar))
        * jnp.sqrt(1.0 - alpha_bar / alpha_bar_prev)
    )
    mean_pred = (
        pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(jnp.maximum(1.0 - alpha_bar_prev - sigma**2, 0.0)) * eps
    )
    if eta == 0.0:
        sample = mean_pred
    else:
        if noise is None:
            # silently skipping the stochastic term would shrink the eps
            # coefficient by sigma^2 without compensation — neither eta=0
            # nor eta>0 DDIM (the reference always draws noise internally,
            # gaussian_diffusion.py:479)
            raise ValueError("ddim_step with eta > 0 requires noise")
        nonzero = (t != 0).astype(x_t.dtype).reshape((-1,) + (1,) * (nd - 1))
        sample = mean_pred + nonzero * sigma * noise
    return DDIMStep(sample=sample, pred_xstart=pred_xstart)


def model_t(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Compact timestep index -> model-facing (rescaled) timestep value
    (the _WrappedModel remap, reference ``respace.py:118-123``)."""
    return sched.model_timesteps[t]
