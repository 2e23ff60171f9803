"""On-device training augmentation (opt-in TPU-native addition).

The reference runs all augmentation in torch DataLoader workers on the
host CPU (``listdataset.py:573-703``: 512^2 intermediate warp via
``F.grid_sample`` + kornia ColorJitter); on a loader-bound host that
serializes training.  This module moves the two bandwidth-heavy
per-sample ops — the intermediate warp and the color jitter — into the
jitted batch-prep on the accelerator, riding ``ops/grid_sample``.
Opt-in via ``train.on_device_aug``; the host dataset then skips its own
warp+jitter (``data/doc3d.py`` ``device_aug`` flag) and ships the
decoded/composited image + backward map instead.

Documented deviation: the host path applies the four jitter ops in a
per-sample random *order* (torchvision ColorJitter semantics); the
device path applies them in a fixed order (brightness, contrast,
saturation, hue) — a 24-way ``lax.switch`` buys nothing at strength 0.1,
where the order effect is far below the factor noise.  Default-off.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dvd_tpu.ops.grid_sample import warp

_LUM = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """Channels-last RGB [0,1] -> HSV with h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h = jnp.where(d > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = (i.astype(jnp.int32) % 6)[..., None]
    rgb = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [jnp.stack([v, t, p], -1), jnp.stack([q, v, p], -1),
         jnp.stack([p, v, t], -1), jnp.stack([p, q, v], -1),
         jnp.stack([t, p, v], -1), jnp.stack([v, p, q], -1)])
    return rgb


def apply_color_jitter(img: jnp.ndarray, bright: jnp.ndarray,
                       contrast: jnp.ndarray, sat: jnp.ndarray,
                       hue: jnp.ndarray) -> jnp.ndarray:
    """The four jitter ops with given per-sample factors.

    Matches ``data/doc3d.color_jitter``'s op formulas exactly (brightness
    scale, scalar-mean contrast, luma-mix saturation, HSV hue rotation in
    turns of [0,1)) so the host/device paths are testably equivalent at
    equal factors.  img (B,H,W,3) [0,1]; factors (B,).
    """
    e = lambda f: f[:, None, None, None].astype(img.dtype)
    img = img * e(bright)
    mean = img.mean(axis=(1, 2, 3), keepdims=True)
    img = (img - mean) * e(contrast) + mean
    gray = img @ _LUM.astype(img.dtype)
    img = img * e(sat) + gray[..., None] * (1.0 - e(sat))
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] + hue[:, None, None].astype(img.dtype)) % 1.0
    img = hsv_to_rgb(jnp.concatenate([h[..., None], hsv[..., 1:]], -1))
    return jnp.clip(img, 0.0, 1.0)


def augment_batch(raw: Dict[str, jnp.ndarray], rng: jax.Array, *,
                  inter_frac: float = 0.0, jitter: bool = True,
                  strength: float = 0.1) -> Dict[str, jnp.ndarray]:
    """Device half of the Doc3D augmentation pipeline.

    raw: ``image512`` (B,512,512,3) float32 [0,255] (decoded, cropped,
    background-composited on the host), ``doc_mask512`` (B,512,512,1)
    [0,1], ``flow_map`` (B,512,512,2) absolute bm offsets.  Produces the
    exact batch contract ``build_device_batch`` consumes.

    The intermediate warp is ``bm_inter = base + frac * (bm - base)``
    (reference listdataset.py:625-646) — in normalized align_corners=True
    coordinates that is ``grid = base_norm + 2*frac*flow/(h-1)``.
    """
    img = raw["image512"] / 255.0
    mask = raw["doc_mask512"]
    flow = raw["flow_map"]
    b, h = img.shape[0], img.shape[1]

    xs = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    base = jnp.stack(jnp.meshgrid(xs, xs, indexing="xy"), axis=-1)  # (h,h,2)
    grid = base[None] + (2.0 * inter_frac / (h - 1.0)) * flow
    src = warp(img, grid)
    msk = warp(mask, grid)

    if jitter:
        kb, kc, ks, kh = jax.random.split(rng, 4)
        u = lambda k, lo, hi: jax.random.uniform(
            k, (b,), jnp.float32, lo, hi)
        src = apply_color_jitter(
            src, u(kb, 1 - strength, 1 + strength),
            u(kc, 1 - strength, 1 + strength),
            u(ks, 1 - strength, 1 + strength),
            u(kh, -strength, strength))

    return {
        "source_image": src.astype(jnp.float32),
        "doc_mask": msk.astype(jnp.float32),
        "flow_map": flow,
        "flow_map_inter": inter_frac * flow,
    }
