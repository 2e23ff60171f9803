"""Improved-diffusion-style UNet denoiser (alternative ``train_mode``
values ``stage_1`` / ``sr`` / ``trg_feat``).

Behavioral parity with reference ``improved_diffusion/unet.py``:
ResBlocks with optional scale-shift GroupNorm conditioning, QKV attention
blocks at configured downsampling ratios, conv up/downsampling,
skip-concat decoder, zero-initialized output conv, residual ``+init_flow``.
The reference's hand-unrolled output loop with ``requires_grad`` fiddling
(``unet.py:768-816``) is mathematically a plain loop and is implemented as
one.

Input assembly per mode (``unet.py:750-762``):
- ``stage_1``: concat[src_feat(64), x(2), init_flow(2)] -> 68ch
- ``trg_feat``: concat[x, init_flow, local_corr, l2norm(trg_feat)]
- ``sr``: concat[x(2), init_flow(2), local_corr(81)] -> 85ch
  (UNetModel_sr, ``unet.py:441-461``)

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvd_tpu.models.layers import GroupNorm32, timestep_embedding

Dtype = Any


class ResBlock(nn.Module):
    out_ch: int
    use_scale_shift_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.silu(GroupNorm32(in_ch, name="norm_in")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(h)

        emb_out = nn.Dense(
            2 * self.out_ch if self.use_scale_shift_norm else self.out_ch,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb))[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(self.out_ch, name="norm_out")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.silu(GroupNorm32(self.out_ch, name="norm_out")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv_out")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="skip_connection")(x)
        return x + h


class AttentionBlock(nn.Module):
    num_heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        y = GroupNorm32(c, name="norm")(x).reshape(n, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        nh = self.num_heads
        dh = c // nh
        q = q.reshape(n, h * w, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(n, h * w, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(n, h * w, nh, dh).transpose(0, 2, 1, 3)
        # improved-diffusion splits the 1/sqrt(d) over q and k
        scale = 1.0 / jnp.sqrt(jnp.sqrt(dh)).astype(jnp.float32)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k * scale)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="proj_out")(out)
        return x + out.reshape(n, h, w, c)


class UNetDenoiser(nn.Module):
    in_channels: int = 68
    model_channels: int = 128
    out_channels: int = 2
    num_res_blocks: int = 3
    attention_ds: Tuple[int, ...] = (4, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    train_mode: str = "stage_1"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, *,
                 src_feat: Optional[jnp.ndarray] = None,
                 init_flow: Optional[jnp.ndarray] = None,
                 local_corr: Optional[jnp.ndarray] = None,
                 trg_feat: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        mc = self.model_channels
        nhu = self.num_heads if self.num_heads_upsample == -1 \
            else self.num_heads_upsample

        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_0")(
            timestep_embedding(t, mc))
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(
            nn.silu(emb))

        if self.train_mode == "trg_feat":
            tf = trg_feat / (jnp.sqrt(jnp.sum(trg_feat**2, -1, keepdims=True))
                             + 1e-6)
            h = jnp.concatenate([x, init_flow, local_corr, tf], axis=-1)
        elif self.train_mode == "sr":
            h = jnp.concatenate([x, init_flow, local_corr], axis=-1)
        elif init_flow is not None:
            h = jnp.concatenate([src_feat, x, init_flow], axis=-1)
        else:
            h = jnp.concatenate([src_feat, x], axis=-1)

        # flax infers in_conv's input dim from the concat — assert it
        # matches the declared variant width so a wrong conditioning set
        # fails loudly instead of silently building a different model
        assert h.shape[-1] == self.in_channels, (
            f"train_mode={self.train_mode!r} conditioning concat has "
            f"{h.shape[-1]} channels, expected in_channels={self.in_channels}")
        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)
        hs = [h]
        ds = 1
        bi = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * mc, self.use_scale_shift_norm, self.dtype,
                             name=f"down_{bi}")(h, emb)
                if ds in self.attention_ds:
                    h = AttentionBlock(self.num_heads, self.dtype,
                                       name=f"down_attn_{bi}")(h)
                hs.append(h)
                bi += 1
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name=f"downsample_{level}")(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(h.shape[-1], self.use_scale_shift_norm, self.dtype,
                     name="middle_res1")(h, emb)
        h = AttentionBlock(self.num_heads, self.dtype, name="middle_attn")(h)
        h = ResBlock(h.shape[-1], self.use_scale_shift_norm, self.dtype,
                     name="middle_res2")(h, emb)

        bi = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(mult * mc, self.use_scale_shift_norm, self.dtype,
                             name=f"up_{bi}")(h, emb)
                if ds in self.attention_ds:
                    h = AttentionBlock(nhu, self.dtype, name=f"up_attn_{bi}")(h)
                bi += 1
                if level and i == self.num_res_blocks:
                    n_, hh, ww, cc = h.shape
                    h = jax.image.resize(h, (n_, hh * 2, ww * 2, cc), "nearest")
                    h = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype,
                                name=f"upsample_{level}")(h)
                    ds //= 2

        h = nn.silu(GroupNorm32(h.shape[-1], name="out_norm")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="out_conv")(h)
        if init_flow is not None:
            h = h + init_flow
        return h
