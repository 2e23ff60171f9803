"""Torch-parity separable image resizing as MXU matmuls.

The reference leans on ``F.interpolate`` with *both* align_corners
conventions and ``mode='area'`` in metric-critical places (e.g. reference
``evaluation.py:64,205-216,301``, ``train_util.py:279-312``).  Bilinear
resampling is separable, so we express each resize as two small dense
matmuls ``out = A_h @ img @ A_w^T`` with interpolation-weight matrices
built in numpy at trace time.  On TPU this runs on the MXU, fuses with
surrounding elementwise ops, and is bit-for-bit the same math as torch's kernels
(verified in tests/test_ops_parity.py against torch CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_weights(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic bilinear interpolation matrix."""
    w = np.zeros((n_out, n_in), dtype=np.float64)
    if n_in == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    for i in range(n_out):
        if align_corners:
            if n_out == 1:
                src = 0.0
            else:
                src = i * (n_in - 1) / (n_out - 1)
        else:
            # torch: max(0, (i + 0.5) * in/out - 0.5)
            src = (i + 0.5) * n_in / n_out - 0.5
            if src < 0.0:
                src = 0.0
        lo = int(np.floor(src))
        lo = min(lo, n_in - 1)
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) adaptive-average-pooling weights (torch mode='area')."""
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -((-(i + 1) * n_in) // n_out)  # ceil((i+1)*n_in/n_out)
        w[i, start:end] = 1.0 / (end - start)
    return w.astype(np.float32)


def _apply_separable(img: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """img: (..., H, W, C); wh: (Ho, H); ww: (Wo, W).

    HIGHEST precision keeps the MXU in full fp32 accumulation — resize sits
    in the metric-critical unwarp path and must match torch bit-for-bit.
    """
    import jax

    a = jnp.asarray(wh, img.dtype)
    b = jnp.asarray(ww, img.dtype)
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,...hwc->...owc", a, img, precision=hp)
    out = jnp.einsum("pw,...owc->...opc", b, out, precision=hp)
    return out


def resize_bilinear(
    img: jnp.ndarray,
    size: Tuple[int, int],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or HWC) image, torch-``F.interpolate``
    semantics for both align_corners settings."""
    ho, wo = size
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (ho, wo):
        return img
    return _apply_separable(img, _linear_weights(h, ho, align_corners),
                            _linear_weights(w, wo, align_corners))


def resize_area(img: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Area (adaptive average pool) downsample, torch ``mode='area'``."""
    ho, wo = size
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (ho, wo):
        return img
    return _apply_separable(img, _area_weights(h, ho), _area_weights(w, wo))
