"""Text-line segmentation UNet (frozen aux model).

Behavioral parity with reference ``geotr/unet_model.py`` /
``unet_parts.py``: classic UNet (bilinear upsampling variant), frozen
BatchNorm, returns **both** the penultimate 64-channel feature map (the
``line_msk`` conditioning input, downsampled to the latent size by the
pipeline — reference ``evaluation.py:214-216``) and the 1-channel logits.

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dvd_tpu.models.layers import FrozenBatchNorm
from dvd_tpu.ops.resize import resize_bilinear

Dtype = Any


class DoubleConv(nn.Module):
    out_ch: int
    mid_ch: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.mid_ch or self.out_ch
        x = nn.Conv(mid, (3, 3), padding=1, dtype=self.dtype, name="conv_0")(x)
        x = nn.relu(FrozenBatchNorm(mid, name="bn_1")(x))
        x = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_3")(x)
        return nn.relu(FrozenBatchNorm(self.out_ch, name="bn_4")(x))


class TextLineUNet(nn.Module):
    """UNet(n_channels=3, n_classes=1, bilinear=True)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        down = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x)
        x2 = DoubleConv(128, dtype=self.dtype, name="down1")(down(x1))
        x3 = DoubleConv(256, dtype=self.dtype, name="down2")(down(x2))
        x4 = DoubleConv(512, dtype=self.dtype, name="down3")(down(x3))
        x5 = DoubleConv(512, dtype=self.dtype, name="down4")(down(x4))

        def up(y, skip, out_ch, mid_ch, name):
            y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2), align_corners=True)
            # (reference pads on odd-size mismatch; sizes here are powers of 2)
            y = jnp.concatenate([skip, y], axis=-1)
            return DoubleConv(out_ch, mid_ch, dtype=self.dtype, name=name)(y)

        x = up(x5, x4, 256, 512, "up1")
        x = up(x, x3, 128, 256, "up2")
        x = up(x, x2, 64, 128, "up3")
        x = up(x, x1, 64, 64, "up4")
        logits = nn.Conv(1, (1, 1), dtype=self.dtype, name="outc")(x)
        return x, logits
