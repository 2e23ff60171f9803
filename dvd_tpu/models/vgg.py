"""Pretrained-VGG16 feature pyramid (frozen aux model).

Behavioral parity with reference
``train_settings/dvd/feature_backbones/VGG_features.py:15-72``: torchvision
VGG16 ``features`` split into blocks at the first ReLU then at each MaxPool:

- level_0: conv(3->64) + relu                        -> 64ch  @ full
- level_1: conv(64->64) + relu + pool                -> 64ch  @ /2
- level_2: (conv+relu)x2 (128) + pool                -> 128ch @ /4
- level_3: (conv+relu)x3 (256) + pool                -> 256ch @ /8

``eigth_resolution`` mode returns [level_0, level_2, level_3] outputs
(64 @ full, 128 @ /4, 256 @ /8).  The reference's ``sixteen_resolution``
branch references a level_4 that its own constructor never builds
(VGG_features.py:39-40 breaks at n_levels=4) and is unreachable dead code.

Used when ``train_VGG=False``: the DiT modes take ``c20 = eigth[-1]``
(256ch @ 64^2, reference ``eval_utils.py:117-145``); the UNet-denoiser mode
takes the shallow 64-ch level resized to the latent with
align_corners=False (``eval_utils.py:148-166``).

Weights are ported from a torchvision ``vgg16`` state_dict via
``dvd_tpu.training.convert``.  Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from dvd_tpu.ops.resize import resize_bilinear

Dtype = Any


class VGG16Pyramid(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "eigth") -> List[jnp.ndarray]:
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name=name)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

        l0 = nn.relu(conv(64, "level_0_conv0")(x))
        l1 = pool(nn.relu(conv(64, "level_1_conv0")(l0)))
        h = nn.relu(conv(128, "level_2_conv0")(l1))
        l2 = pool(nn.relu(conv(128, "level_2_conv1")(h)))
        h = nn.relu(conv(256, "level_3_conv0")(l2))
        h = nn.relu(conv(256, "level_3_conv1")(h))
        l3 = pool(nn.relu(conv(256, "level_3_conv2")(h)))

        if mode == "eigth":
            return [l0, l2, l3]
        if mode == "quarter":
            return [l2]
        if mode == "sixteen":
            # Intentionally omitted: the reference's sixteen_resolution
            # branch (eval_utils.py:116-166 / VGG_features.py:39-40) indexes
            # a level_4 its constructor never builds — dead on arrival.
            raise NotImplementedError(
                "sixteen_resolution is unreachable dead code in the "
                "reference (VGG_features.py:39-40); not implemented")
        return [l0, l1, l2, l3]


def c20_for_dit(feats: List[jnp.ndarray], feature_size: int = 64) -> jnp.ndarray:
    """extract_raw_features_single2: deepest eigth-mode level (256ch @ /8)."""
    assert feats[-1].shape[1] == feature_size
    return feats[-1]


def c20_for_unet(feats: List[jnp.ndarray], feature_size: int = 64) -> jnp.ndarray:
    """extract_raw_features_single: shallow 64-ch level resized to the
    latent size with align_corners=False."""
    return resize_bilinear(feats[0], (feature_size, feature_size), align_corners=False)
