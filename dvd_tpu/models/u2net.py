"""U^2-Net-small document segmentation network (frozen aux model).

Behavioral parity with the reference ``geotr_core.py:24-332,846-995``:
recursive RSU blocks (Conv-BN-ReLU with dilation), ceil-mode max pooling,
align_corners=False bilinear upsampling, six side outputs fused by a 1x1
conv.  The pipeline consumes both the sigmoid mask and the six decoder
feature maps (``hx6, hx5d..hx1d``) which — resized to the latent size and
concatenated — form the 384-channel ``seg_map_all`` conditioning stream
(reference ``evaluation.py:204-212``).

Always evaluated frozen (reference ``geotr_core.py:884-886``), so BatchNorm
uses stored running statistics.

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dvd_tpu.models.layers import FrozenBatchNorm
from dvd_tpu.ops.resize import resize_bilinear

Dtype = Any


def max_pool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool with ceil_mode=True (pad odd H/W with -inf)."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def upsample_like(src: jnp.ndarray, tar_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=False resize to target spatial size
    (reference ``_upsample_like``, geotr_core.py:42-45)."""
    return resize_bilinear(src, tar_hw, align_corners=False)


class REBNCONV(nn.Module):
    out_ch: int
    dirate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_ch, (3, 3), padding=self.dirate,
            kernel_dilation=(self.dirate, self.dirate),
            dtype=self.dtype, name="conv_s1",
        )(x)
        x = FrozenBatchNorm(self.out_ch, name="bn_s1")(x)
        return nn.relu(x)


class RSU(nn.Module):
    """RSU-L block: L encoder levels with pooling, dilated bottleneck,
    skip-connected decoder, residual to the input conv."""

    height: int       # 7, 6, 5, or 4
    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hxin = REBNCONV(self.out_ch, 1, self.dtype, name="rebnconvin")(x)

        enc = [REBNCONV(self.mid_ch, 1, self.dtype, name="rebnconv1")(hxin)]
        h = enc[0]
        for i in range(2, self.height):
            h = max_pool_ceil(h)
            h = REBNCONV(self.mid_ch, 1, self.dtype, name=f"rebnconv{i}")(h)
            enc.append(h)
        top = REBNCONV(self.mid_ch, 2, self.dtype, name=f"rebnconv{self.height}")(enc[-1])

        d = top
        for i in range(self.height - 1, 0, -1):
            skip = enc[i - 1]
            d = REBNCONV(
                self.out_ch if i == 1 else self.mid_ch, 1, self.dtype,
                name=f"rebnconv{i}d",
            )(jnp.concatenate([d, skip], axis=-1))
            if i > 1:
                d = upsample_like(d, enc[i - 2].shape[1:3])
        return d + hxin


class RSU4F(nn.Module):
    """Dilation-only RSU (no pooling), dilations 1/2/4/8."""

    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hxin = REBNCONV(self.out_ch, 1, self.dtype, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, 1, self.dtype, name="rebnconv1")(hxin)
        h2 = REBNCONV(self.mid_ch, 2, self.dtype, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, 4, self.dtype, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, 8, self.dtype, name="rebnconv4")(h3)
        d3 = REBNCONV(self.mid_ch, 4, self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1))
        d2 = REBNCONV(self.mid_ch, 2, self.dtype, name="rebnconv2d")(
            jnp.concatenate([d3, h2], axis=-1))
        d1 = REBNCONV(self.out_ch, 1, self.dtype, name="rebnconv1d")(
            jnp.concatenate([d2, h1], axis=-1))
        return d1 + hxin


class U2NetP(nn.Module):
    """U^2-Net small. Returns (sigmoid(d0), hx6, hx5d, hx4d, hx3d, hx2d, hx1d)."""

    out_ch: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        s1 = RSU(7, 16, 64, self.dtype, name="stage1")(x)
        s2 = RSU(6, 16, 64, self.dtype, name="stage2")(max_pool_ceil(s1))
        s3 = RSU(5, 16, 64, self.dtype, name="stage3")(max_pool_ceil(s2))
        s4 = RSU(4, 16, 64, self.dtype, name="stage4")(max_pool_ceil(s3))
        s5 = RSU4F(16, 64, self.dtype, name="stage5")(max_pool_ceil(s4))
        s6 = RSU4F(16, 64, self.dtype, name="stage6")(max_pool_ceil(s5))

        hx6up = upsample_like(s6, s5.shape[1:3])
        d5 = RSU4F(16, 64, self.dtype, name="stage5d")(
            jnp.concatenate([hx6up, s5], axis=-1))
        d5up = upsample_like(d5, s4.shape[1:3])
        d4 = RSU(4, 16, 64, self.dtype, name="stage4d")(
            jnp.concatenate([d5up, s4], axis=-1))
        d4up = upsample_like(d4, s3.shape[1:3])
        d3 = RSU(5, 16, 64, self.dtype, name="stage3d")(
            jnp.concatenate([d4up, s3], axis=-1))
        d3up = upsample_like(d3, s2.shape[1:3])
        d2 = RSU(6, 16, 64, self.dtype, name="stage2d")(
            jnp.concatenate([d3up, s2], axis=-1))
        d2up = upsample_like(d2, s1.shape[1:3])
        d1 = RSU(7, 16, 64, self.dtype, name="stage1d")(
            jnp.concatenate([d2up, s1], axis=-1))

        side = lambda name, h: nn.Conv(self.out_ch, (3, 3), padding="SAME",
                                       dtype=self.dtype, name=name)(h)
        full = s1.shape[1:3]
        o1 = side("side1", d1)
        o2 = upsample_like(side("side2", d2), full)
        o3 = upsample_like(side("side3", d3), full)
        o4 = upsample_like(side("side4", d4), full)
        o5 = upsample_like(side("side5", d5), full)
        o6 = upsample_like(side("side6", s6), full)
        d0 = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="outconv")(
            jnp.concatenate([o1, o2, o3, o4, o5, o6], axis=-1))
        return nn.sigmoid(d0), s6, d5, d4, d3, d2, d1


class Seg(nn.Module):
    """Seg wrapper (reference ``geotr_core.py:984-995``): hard-masks the
    image at 0.5, upsamples the soft mask to 512, and exposes the six
    decoder side features for the ``seg_map_all`` conditioning."""

    mask_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d0, hx6, hx5d, hx4d, hx3d, hx2d, hx1d = U2NetP(
            1, self.dtype, name="msk")(x)
        hard = (d0 > 0.5).astype(x.dtype)
        mskx = hard * x
        d0_up = resize_bilinear(d0, (self.mask_size, self.mask_size),
                                align_corners=True)
        return mskx, d0_up, hx6, hx5d, hx4d, hx3d, hx2d, hx1d


def seg_pyramid_to_latent(
    feats, latent_size: int
) -> jnp.ndarray:
    """Resize the six decoder side features to the latent size
    (align_corners=False) and concatenate -> (N, S, S, 384)
    (reference ``evaluation.py:204-212``, order hx6..hx1d)."""
    resized = [
        resize_bilinear(f, (latent_size, latent_size), align_corners=False)
        for f in feats
    ]
    return jnp.concatenate(resized, axis=-1)
