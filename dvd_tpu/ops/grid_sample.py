"""Bilinear grid sampling with exact ``torch.nn.functional.grid_sample``
semantics (``align_corners=True``, ``padding_mode='zeros'`` by default).

This is the single hottest non-matmul op in the framework — the reference
uses it for the output unwarp, the composed warp loss, the time-variant
feature re-warp inside the sampler, and dataset intermediate-warp synthesis
(reference ``datasets/utils/warping.py:26-73``, ``gaussian_diffusion.py:999``).

Two implementations:
- :func:`grid_sample` — pure-jnp gather formulation. XLA lowers the four
  corner gathers to efficient dynamic-gathers; fully differentiable w.r.t.
  both image and grid (needed in the loss path).
- ``dvd_tpu.ops.pallas.grid_sample_kernel`` — fused Pallas TPU kernel for
  the inference unwarp path (one pass, no 4x corner materialization).

Layout: images are NHWC, grids are ``(N, Ho, Wo, 2)`` with
``grid[..., 0] = x`` in [-1, 1] (torch convention).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    *,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Sample ``img`` (N, H, W, C) at ``grid`` (N, Ho, Wo, 2) -> (N, Ho, Wo, C).

    Matches torch ``F.grid_sample`` for ``mode in {bilinear, nearest}`` and
    ``padding_mode in {zeros, border}``.
    """
    if img.ndim != 4 or grid.ndim != 4 or grid.shape[-1] != 2:
        raise ValueError(f"bad shapes img={img.shape} grid={grid.shape}")
    n, h, w, c = img.shape
    gn, ho, wo, _ = grid.shape
    if gn != n:
        raise ValueError(f"batch mismatch {n} vs {gn}")

    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    gx = _unnormalize(grid[..., 0].astype(compute_dtype), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(compute_dtype), h, align_corners)

    if mode == "nearest":
        xi = jnp.round(gx).astype(jnp.int32)
        yi = jnp.round(gy).astype(jnp.int32)
        corners = [(yi, xi, None)]
    elif mode == "bilinear":
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        tx = (gx - x0)[..., None]
        ty = (gy - y0)[..., None]
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        corners = [
            (y0, x0, (1 - ty) * (1 - tx)),
            (y0, x0 + 1, (1 - ty) * tx),
            (y0 + 1, x0, ty * (1 - tx)),
            (y0 + 1, x0 + 1, ty * tx),
        ]
    else:
        raise NotImplementedError(mode)

    img_flat = img.reshape(n * h * w, c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]

    out = jnp.zeros((n, ho, wo, c), dtype=compute_dtype)
    for yi, xi, wgt in corners:
        if padding_mode == "zeros":
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            mask = valid[..., None].astype(compute_dtype)
        elif padding_mode == "border":
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            mask = None
        else:
            raise NotImplementedError(padding_mode)
        idx = batch_off + yc * w + xc
        vals = jnp.take(img_flat, idx.reshape(-1), axis=0)
        vals = vals.reshape(n, ho, wo, c)
        if mask is not None:
            vals = vals * mask
        if wgt is not None:
            vals = vals * wgt.astype(compute_dtype)
        out = out + vals
    return out.astype(img.dtype)


def warp(img: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Reference ``register_model2([img, grid])`` equivalent
    (``warping.py:14-73``): grid already in [-1, 1], align_corners=True,
    zero padding."""
    return grid_sample(img, grid, align_corners=True, padding_mode="zeros", mode=mode)
