"""GeoTr coarse dewarper + DocTr-style transformer stack (frozen aux model),
plus the GeoTr2 alternative denoiser.

Behavioral parity with reference ``geotr_core.py:337-740`` and
``geotr/extractor.py``:
- RAFT ``BasicEncoder`` (7x7/2 conv + instance norm, residual layers to /8,
  1x1 head to 256ch) — instance norm without affine params
- ``attnLayer``: post-norm self-attn + one cross-attn over the (single)
  memory + FFN, all with DETR sine positional embeddings added to q/k
- ``TransDecoder`` with a learned (tokens x 256) query bank
- RAFT ``UpdateBlock`` + convex 8x upsampling of the coarse flow
- ``GeoTr``: 288^2 image -> absolute backward map (0..288) at 288^2
- ``GeoTrSegInf``: soft-mask the image with U2NetP, return (bm, mask_512)
  (reference ``geotr_core.py:997-1019``)

Layout: NHWC.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dvd_tpu.models.layers import CrossAttention, merge_heads, scaled_dot_attention, split_heads
from dvd_tpu.models.u2net import U2NetP
from dvd_tpu.ops.resize import resize_bilinear

Dtype = Any


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.InstanceNorm2d default: no affine, per-sample/channel
    spatial normalization."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(instance_norm(y))
        # Note: the reference's BasicEncoder2 feeds a 68-ch input into a
        # 64-ch stride-1 block with no projection (extractor.py:119-175 via
        # geotr_core.py:670) — that code path cannot execute in torch
        # either (train_mode='stage_1_doctr' is broken upstream).  We add
        # the standard 1x1 projection whenever shapes mismatch.
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="downsample_0")(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT encoder: 3ch -> output_dim at /8 (reference extractor.py:59-115)."""

    output_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(instance_norm(x))
        x = ResidualBlock(64, 1, self.dtype, name="layer1_0")(x)
        x = ResidualBlock(64, 1, self.dtype, name="layer1_1")(x)
        x = ResidualBlock(128, 2, self.dtype, name="layer2_0")(x)
        x = ResidualBlock(128, 1, self.dtype, name="layer2_1")(x)
        x = ResidualBlock(192, 2, self.dtype, name="layer3_0")(x)
        x = ResidualBlock(192, 1, self.dtype, name="layer3_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


class BasicEncoder2(nn.Module):
    """Variant used by GeoTr2: skips the stem conv and layer3; consumes an
    arbitrary-channel input at full res -> output_dim at /2
    (reference extractor.py:119-174)."""

    output_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(instance_norm(x))
        x = ResidualBlock(64, 1, self.dtype, name="layer1_0")(x)
        x = ResidualBlock(64, 1, self.dtype, name="layer1_1")(x)
        x = ResidualBlock(128, 2, self.dtype, name="layer2_0")(x)
        x = ResidualBlock(128, 1, self.dtype, name="layer2_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


def sine_position_embedding(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0) -> np.ndarray:
    """DETR PositionEmbeddingSine with normalize=True over an all-ones mask
    (reference position_encoding.py:36-77) -> (h, w, 2*num_pos_feats),
    channel order [y-embed, x-embed]."""
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.ones((h, 1)) * np.arange(1, w + 1, dtype=np.float64)[None, :]
    y = y / (h + 1e-6) * (2 * math.pi)
    x = x / (w + 1e-6) * (2 * math.pi)
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    # interleave sin on even indices / cos on odd indices
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1).astype(np.float32)


class AttnLayer(nn.Module):
    """Post-norm transformer layer: self-attn + cross-attn + FFN, with
    positional embeddings added to queries/keys (reference
    geotr_core.py:337-478; only the first of the two cross-attn modules is
    ever reached because memory_list has a single entry)."""

    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 pos: jnp.ndarray, memory_pos: jnp.ndarray) -> jnp.ndarray:
        sa = CrossAttention(self.d_model, self.nhead, self.dtype, name="self_attn")
        ca = CrossAttention(self.d_model, self.nhead, self.dtype, name="multihead_attn_0")
        q = k = tgt + pos
        tgt = tgt + sa(q, k, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        tgt2 = ca(tgt + pos, memory + memory_pos, memory)
        tgt = tgt + tgt2
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2_0")(tgt)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(y))
        tgt = tgt + y
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)


class TransEncoder(nn.Module):
    num_layers: int = 6
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgf: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = imgf.shape
        pos = jnp.asarray(
            sine_position_embedding(h, w, self.hidden_dim // 2), imgf.dtype
        ).reshape(1, h * w, c)
        x = imgf.reshape(n, h * w, c)
        for i in range(self.num_layers):
            x = AttnLayer(self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(
                x, x, pos, pos)
        return x.reshape(n, h, w, c)


class TransDecoder(nn.Module):
    num_layers: int = 6
    hidden_dim: int = 256
    num_tokens: int = 1296
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgf: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = imgf.shape
        pos = jnp.asarray(
            sine_position_embedding(h, w, self.hidden_dim // 2), imgf.dtype
        ).reshape(1, h * w, c)
        query = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_tokens, self.hidden_dim),
        ).astype(imgf.dtype)
        x = jnp.broadcast_to(query[None], (n,) + query.shape)
        mem = imgf.reshape(n, h * w, c)
        for i in range(self.num_layers):
            x = AttnLayer(self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(
                x, mem, pos, pos)
        return x.reshape(n, h, w, c)


class UpdateBlock(nn.Module):
    """RAFT flow head + convex-upsampling mask head (geotr_core.py:553-568)."""

    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgf: jnp.ndarray, coords1: jnp.ndarray):
        m = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="mask_0")(imgf)
        m = nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_2")(nn.relu(m))
        mask = 0.25 * m
        f = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="flow_head_conv1")(imgf)
        dflow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="flow_head_conv2")(
            nn.relu(f))
        return mask, coords1 + dflow


def coords_grid_pixels(n: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(N, H, W, 2) absolute pixel coordinates, x first
    (reference ``coords_grid``, geotr_core.py:571-574)."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                          indexing="ij")
    g = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(g[None], (n, h, w, 2))


def convex_upsample_flow(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex combination 8x upsampling (reference geotr_core.py:713-724).

    flow: (N, H, W, 2); mask: (N, H, W, 576) -> (N, 8H, 8W, 2).
    """
    n, h, w, _ = flow.shape
    mask = mask.reshape(n, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighborhoods of 8*flow (zero padding), torch F.unfold order
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [fp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (N, H, W, 9, 2)
    up = jnp.einsum("nhwkpq,nhwkc->nhwpqc", mask, patches)
    # (N, H, W, 8, 8, 2) -> (N, 8H, 8W, 2)
    up = jnp.einsum("nhwpqc->nhpwqc", up)
    return up.reshape(n, 8 * h, 8 * w, 2)


class GeoTr(nn.Module):
    """Coarse dewarper: 288^2 image -> absolute backward map (0..288)
    at 288^2 (reference geotr_core.py:690-740)."""

    num_attn_layers: int = 6
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = image.shape
        fmap = nn.relu(BasicEncoder(self.hidden_dim, self.dtype, name="fnet")(image))
        fmap = TransEncoder(self.num_attn_layers, self.hidden_dim, self.dtype,
                            name="TransEncoder")(fmap)
        fmap = TransDecoder(self.num_attn_layers, self.hidden_dim,
                            (h // 8) * (w // 8), self.dtype,
                            name="TransDecoder")(fmap)
        coords0 = coords_grid_pixels(n, h // 8, w // 8, jnp.float32)
        mask, coords1 = UpdateBlock(self.hidden_dim, self.dtype,
                                    name="update_block")(fmap, coords0)
        return convex_upsample_flow(coords1 - coords0, mask)


class GeoTrSegInf(nn.Module):
    """Inference wrapper (geotr_core.py:997-1019): soft U2NetP mask x image
    -> GeoTr backward map; also returns the soft mask upsampled to
    ``mask_size`` (512 in production)."""

    mask_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        msk, *_ = U2NetP(1, self.dtype, name="msk")(x)
        x = msk * x
        msk_up = resize_bilinear(msk, (self.mask_size, self.mask_size),
                                 align_corners=True)
        bm = GeoTr(6, 256, self.dtype, name="GeoTr")(x)
        return bm, msk_up


class GeoTrSeg(nn.Module):
    """Training-time wrapper (geotr_core.py:962-982): *hard* 0.5-threshold
    mask (vs the soft mask of GeoTrSegInf) applied to the image before
    GeoTr."""

    mask_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        msk, *_ = U2NetP(1, self.dtype, name="msk")(x)
        hard = (msk > 0.5).astype(x.dtype)
        x = hard * x
        msk_up = resize_bilinear(hard, (self.mask_size, self.mask_size),
                                 align_corners=True)
        bm = GeoTr(6, 256, self.dtype, name="GeoTr")(x)
        return bm, msk_up


class GeoTrSegWoMask(nn.Module):
    """Mask-free variant (geotr_core.py:1021-1040)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        bm = GeoTr(6, 256, self.dtype, name="GeoTr")(x)
        return bm, None


class GeoTr2(nn.Module):
    """DocTr-as-denoiser (train_mode='stage_1_doctr',
    geotr_core.py:612-685): consumes [src_feat(64) ++ x(2) ++ init_flow(2)]
    at the latent size, returns a flow offset at the latent size.

    Upstream, ``GeoTr2.forward`` is broken as shipped: ``__init__`` never
    sets ``self.train_mode`` (geotr_core.py:613-632 — the attribute read at
    :659 raises ``AttributeError``), and ``self.TransDecoder`` is wrapped in
    ``TimestepEmbedSequential`` (geotr_core.py:622), which forwards its
    second positional only to ``TimestepBlock`` children — so the
    ``query_embed.weight`` passed at :675 is silently dropped and the inner
    ``TransDecoder.forward(fmap, query_embed)`` is called one argument
    short.  We implement the evident intent (decoder receives the learned
    query embedding; mode taken from construction), so no torch-side
    output-parity test is possible for this family — structure parity and
    train/serve behavior are covered by tests/test_alt_denoisers.py."""

    num_attn_layers: int = 6
    hidden_dim: int = 256
    latent: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, *, src_feat: jnp.ndarray,
                 init_flow: jnp.ndarray):
        h = jnp.concatenate([src_feat, x, init_flow], axis=-1)
        fmap = nn.relu(BasicEncoder2(self.hidden_dim, self.dtype, name="fnet")(h))
        fmap = TransEncoder(self.num_attn_layers, self.hidden_dim, self.dtype,
                            name="TransEncoder_0")(fmap)
        fmap = TransDecoder(self.num_attn_layers, self.hidden_dim,
                            (self.latent // 2) ** 2, self.dtype,
                            name="TransDecoder_0")(fmap)
        n, hh, ww, _ = fmap.shape
        coords0 = coords_grid_pixels(n, hh, ww, jnp.float32)
        mask, coords1 = UpdateBlock(self.hidden_dim, self.dtype,
                                    name="update_block")(fmap, coords0)
        bm = convex_upsample_flow(coords1 - coords0, mask)
        bm = resize_bilinear(bm, (self.latent, self.latent), align_corners=True) / 256.0
        return bm, None
