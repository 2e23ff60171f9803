"""Coordinate grids and the DvD flow/backward-map conventions.

The reference juggles at least three coordinate conventions (see reference
``gaussian_diffusion.py:23-28,218-223``, ``evaluation.py:300-306``,
``utils_data/io.py:166-213``):

1. **base grid** ``base``: per-pixel normalized coordinates in ``[0, 1]``,
   ``base[..., 0] = x / (W-1)``, ``base[..., 1] = y / (H-1)``.
2. **flow / offset field** ``f``: the model state. The denoised 2-channel
   latent is an *offset* such that ``bm01 = f + base`` is the normalized
   backward map in [0, 1] (approximately; the latent itself lives in [-1,1]
   after the ``*2-1`` affine).
3. **sampling grid** ``g = (f + base) * 2 - 1``: the [-1, 1] grid consumed
   by ``grid_sample`` (x = width coordinate first, matching torch).

Everything here is channel-last ``(..., H, W, 2)`` with ``[..., 0] = x``.

The final unwarp additionally shrinks the grid by ``0.987``
(reference ``evaluation.py:306``) — kept as ``UNWARP_SHRINK``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Load-bearing fudge factor for metric parity: reference evaluation.py:306
# builds the final sampling grid as ((flow + base) * 2 - 1) * 0.987.
UNWARP_SHRINK = 0.987


@functools.lru_cache(maxsize=32)
def _base_grid_np(h: int, w: int) -> np.ndarray:
    ys, xs = np.meshgrid(
        np.linspace(0.0, 1.0, h, dtype=np.float64),
        np.linspace(0.0, 1.0, w, dtype=np.float64),
        indexing="ij",
    )
    return np.stack([xs, ys], axis=-1).astype(np.float32)  # (h, w, 2), x first


def base_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized [0,1] coordinate grid, shape ``(h, w, 2)``, x first.

    Equivalent to reference ``coords_grid_tensor((h,w)) / (h-1)``
    (``gaussian_diffusion.py:23-28,219``) transposed to channel-last.
    """
    return jnp.asarray(_base_grid_np(h, w), dtype=dtype)


def flow_to_grid(flow: jnp.ndarray, shrink: float = 1.0) -> jnp.ndarray:
    """Offset field -> [-1, 1] sampling grid: ``((flow + base) * 2 - 1) * s``.

    ``flow``: ``(..., H, W, 2)`` offsets in base-normalized units.
    """
    h, w = flow.shape[-3], flow.shape[-2]
    g = (flow + base_grid(h, w, flow.dtype)) * 2.0 - 1.0
    if shrink != 1.0:
        g = g * shrink
    return g


def grid_to_flow(grid: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`flow_to_grid` (with shrink=1)."""
    h, w = grid.shape[-3], grid.shape[-2]
    return (grid + 1.0) * 0.5 - base_grid(h, w, grid.dtype)


def absolute_bm_to_flow(bm: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Absolute backward map in pixels (0..W-1 / 0..H-1) -> offset field.

    Matches the training-loop normalization (reference
    ``train_util.py:306-312``): divide by (size-1); the dataset already
    subtracted the base grid so flows are offsets.
    """
    scale = jnp.asarray([w - 1.0, h - 1.0], dtype=bm.dtype)
    return bm / scale


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))
