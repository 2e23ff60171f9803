"""Diffusion noise schedules as a frozen array table.

All tables are precomputed in float64 numpy (matching the reference's
precision choice, ``gaussian_diffusion.py:171-212``) and stored as a frozen
pytree of float32 device arrays; inside jit we only ever index them with a
timestep vector.  Respacing (reference ``respace.py``) is folded in at
construction: a ``DiffusionSchedule`` built with respacing contains the
re-derived betas *and* the ``timestep_map`` used to rescale model-facing
timesteps (the ``x 1000/T`` behavior of ``_WrappedModel``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Set, Union

import jax
import jax.numpy as jnp
import numpy as np


def linear_betas(n: int) -> np.ndarray:
    """Ho et al. linear schedule scaled for any step count."""
    scale = 1000.0 / n
    return np.linspace(scale * 1e-4, scale * 0.02, n, dtype=np.float64)


def cosine_betas(n: int, max_beta: float = 0.999) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (alpha_bar discretization)."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [
        min(1.0 - alpha_bar((i + 1) / n) / alpha_bar(i / n), max_beta)
        for i in range(n)
    ]
    return np.array(betas, dtype=np.float64)


def named_betas(name: str, n: int) -> np.ndarray:
    if name == "linear":
        return linear_betas(n)
    if name == "cosine":
        return cosine_betas(n)
    raise ValueError(f"unknown schedule {name!r}")


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """Select a subset of base timesteps (same grammar as the reference
    ``respace.py:7-60``: comma-separated section counts or ``ddimN``)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot make exactly {desired} ddim steps from {num_timesteps}")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, taken = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += stride
        start_idx += size
    return set(taken)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed diffusion tables, indexable by a timestep vector."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # FIXED_LARGE variance tables (reference p_mean_variance, :364-376)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    # model-facing timestep values: original-index * (1000/original_T) when
    # rescale_timesteps, else the raw kept indices (respace.py:118-123)
    model_timesteps: jnp.ndarray
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))

    def gather(self, table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """table[t] broadcast to an ndim-rank tensor (batch leading)."""
        out = table[t].astype(jnp.float32)
        return out.reshape(out.shape + (1,) * (ndim - 1))


def make_schedule(
    *,
    steps: int,
    schedule_name: str = "cosine",
    respacing: Union[str, Sequence[int], None] = "",
    rescale_timesteps: bool = True,
) -> DiffusionSchedule:
    base_betas = named_betas(schedule_name, steps)
    if not ((base_betas > 0).all() and (base_betas <= 1).all()):
        raise ValueError(
            f"invalid betas for schedule={schedule_name!r} steps={steps} "
            "(linear is only valid for large step counts)"
        )

    if respacing:
        keep = sorted(space_timesteps(steps, respacing))
    else:
        keep = list(range(steps))

    base_alphas_cumprod = np.cumprod(1.0 - base_betas)
    betas, last = [], 1.0
    for i in keep:
        a = base_alphas_cumprod[i]
        betas.append(1.0 - a / last)
        last = a
    betas = np.array(betas, dtype=np.float64)

    n = len(betas)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])

    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    if n == 1:
        post_logvar = np.log(np.array([posterior_variance[0] + 1e-10]))
    else:
        post_logvar = np.log(np.append(posterior_variance[1], posterior_variance[1:]))

    # FIXED_LARGE: betas with the first entry replaced by posterior var
    # (reference gaussian_diffusion.py:364-376; n>1 branch drops index 0 and
    # prepends posterior_variance[1] -> equals np.append(pv[1], betas[1:]))
    if n == 1:
        fl_var = np.append(posterior_variance[0], betas[0:])[:1]
    else:
        fl_var = np.append(posterior_variance[1], betas[1:])
    fl_logvar = np.log(np.maximum(fl_var, 1e-20))

    if rescale_timesteps:
        model_ts = np.array(keep, dtype=np.float64) * (1000.0 / steps)
    else:
        model_ts = np.array(keep, dtype=np.float64)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(post_logvar),
        posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        fixed_large_variance=f32(fl_var),
        fixed_large_log_variance=f32(fl_logvar),
        model_timesteps=f32(model_ts),
        num_timesteps=n,
    )
