"""The DvD coordinate-denoising DiT (production denoiser).

Behavioral map of the reference ``cross_model.py``:
- private VGG-ish conditioning pyramid over RGB+mask at 512^2 -> 256ch @ /8
  (``cross_model.py:18-95``)
- five patch embedders: noisy flow (2ch), recurrent state r = init_flow ++
  init_feat (258ch), image cond (256ch), seg-mask pyramid (384ch),
  text-line features (64ch) (``:396-411``)
- DiTBlock with *shared* cross-attention applied in parallel against the
  3-4 conditioning streams, each branch then passing through the shared
  adaLN-zero self-attn + MLP (``:147-312``, 'para' mode)
- streams concatenated channel-wise and fused by a SATRN Decoder, then an
  adaLN final layer with the timestep embedding tiled per stream
  (``:314-336,444-454``)
- residual output ``x + init_flow``; returns ``(pred_flow, cond_feat)``
  so the sampler can re-warp the features between DDIM steps (``:645-647``)

Reference quirks preserved under the default config:
- **Dead-block quirk**: the reference forward never chains blocks — each
  block consumes the *original* token sequence and only the last block's
  output reaches the decoder (``:615-616``).  With ``chain_blocks=False``
  we replicate that literally; XLA dead-code-eliminates the 11 unused
  blocks, which is also why DDP needed ``find_unused_parameters=True``
  upstream.  ``chain_blocks=True`` gives a proper chained DiT (streams
  averaged between blocks) for from-scratch training.
- **Timestep remap hack** (``:575-579``): at sampling the respaced,
  x(1000/3)-rescaled timesteps are folded back to {0,1,2} before embedding;
  training calls skip the remap.  Controlled by the ``remap_timesteps``
  call flag.

Layout: NHWC images, (N, T, D) tokens.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dvd_tpu.models import satrn
from dvd_tpu.models.layers import (
    CrossAttention,
    Mlp,
    PatchEmbed,
    SelfAttention,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    layer_norm,
    modulate,
)
from dvd_tpu.ops.resize import resize_bilinear

Dtype = Any

zeros_init = nn.initializers.zeros


class ConditioningPyramid(nn.Module):
    """Private trainable conditioning pyramid (reference VGGPyramid,
    ``cross_model.py:18-95``): 4ch (RGB+mask) 512^2 -> 256ch @ 64^2.

    Conv3x3+ReLU stages with 2x maxpool between levels; level_3 depth
    depends on the latent size exactly like the reference.
    """

    input_size: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, name: nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype, name=name)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

        x = nn.relu(conv(64, "level_0_conv0")(x))
        x = pool(nn.relu(conv(64, "level_1_conv0")(x)))
        x = nn.relu(conv(128, "level_2_conv0")(x))
        x = pool(nn.relu(conv(128, "level_2_conv1")(x)))
        if self.input_size in (64, 32, 16):
            x = nn.relu(conv(256, "level_3_conv0")(x))
            x = nn.relu(conv(256, "level_3_conv1")(x))
            x = nn.relu(conv(256, "level_3_conv2")(x))
            x = pool(x)
        elif self.input_size == 128:
            x = nn.relu(conv(256, "level_3_conv0")(x))
            x = nn.relu(conv(256, "level_3_conv1")(x))
        else:
            raise ValueError(f"unsupported latent size {self.input_size}")
        return x


def embed_stream_tokens(
    dit: "DiT",
    params: Any,
    feat: Optional[jnp.ndarray] = None,        # (N, S, S, 256) pyramid/VGG
    mask_y512: Optional[jnp.ndarray] = None,   # (N, S, S, 384)
    line_msk: Optional[jnp.ndarray] = None,    # (N, S, S, 64)
) -> dict:
    """The c/m/l patch-embedder outputs (+pos), as a standalone function
    over the DiT param tree.

    These conditioning streams are constant across the DDIM steps AND the
    n_batch hypotheses, yet the in-model path recomputes each embedder
    T x n_batch times per image (the reference recomputes them inside
    every denoiser call, ``cross_model.py:586-611``).  Serving hoists
    them here — once per image batch, before hypothesis tiling — and
    feeds them back through the ``*_tokens`` bypasses of
    :meth:`DiT.__call__`.  Bit-identical by construction: the SAME flax
    submodules run on the same inputs (conv then +pos, same dtype), just
    outside the sampling loop.
    """
    grid = dit.input_size // dit.patch_size
    pos = jnp.asarray(
        get_2d_sincos_pos_embed(dit.hidden_size, grid), dit.dtype)[None]
    emb = lambda sub, x: PatchEmbed(dit.patch_size, dit.hidden_size,
                                    dit.dtype).apply(
        {"params": params[sub]}, x.astype(dit.dtype)) + pos
    out = {}
    if feat is not None:
        out["cond_tokens"] = emb("c_embedder", feat)
    if mask_y512 is not None:
        out["msk6_tokens"] = emb("m_embedder", mask_y512)
    if line_msk is not None:
        out["line_tokens"] = emb("l_embedder", line_msk)
    return out


def conditioning_pyramid_features(
    pyramid_params: Any,
    y512: jnp.ndarray,
    mask_cat: Optional[jnp.ndarray],
    input_size: int,
    dtype: Any,
) -> jnp.ndarray:
    """The DiT's internal conditioning computation (forward path below:
    mask concat -> ConditioningPyramid -> 16/32 resize), as a standalone
    function over the ``pyramid`` param subtree.

    This is THE definition of what the ``src_feat`` bypass must receive:
    both hoists (serving ``pipeline._hoist_pyramid`` and the train step's
    ``train_state.loss_fn``) call this, so the bypass stays
    operation-identical to the in-model path by construction."""
    y = y512 if mask_cat is None else jnp.concatenate([y512, mask_cat], -1)
    feat = ConditioningPyramid(input_size, dtype).apply(
        {"params": pyramid_params}, y.astype(dtype))
    if input_size in (16, 32):
        feat = resize_bilinear(feat, (input_size, input_size), True)
    return feat


class DiTBlock(nn.Module):
    """adaLN-Zero DiT block with shared parallel cross-attention branches."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    mode: str = "para"  # "para" | "seq" | "one"
    dtype: Dtype = jnp.float32
    quant: bool = False   # dynamic-int8 matmuls (serving only; adaLN stays fp)

    @nn.compact
    def __call__(self, x, t_emb, cond, msk6=None, msk_line=None, r=None):
        ada = nn.Dense(
            6 * self.hidden_size, dtype=self.dtype,
            kernel_init=zeros_init, bias_init=zeros_init,
            name="adaLN_modulation_1",
        )(nn.silu(t_emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(ada, 6, axis=-1)

        cross = CrossAttention(self.hidden_size, self.num_heads, self.dtype,
                               self.quant, name="cross_attn")
        attn = SelfAttention(self.hidden_size, self.num_heads, self.dtype,
                             self.quant, name="attn")
        mlp = Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                  self.dtype, self.quant, name="mlp")

        def backbone(xi):
            xi = xi + gate_msa[:, None, :] * attn(modulate(layer_norm(xi), shift_msa, scale_msa))
            xi = xi + gate_mlp[:, None, :] * mlp(modulate(layer_norm(xi), shift_mlp, scale_mlp))
            return xi

        if self.mode == "para":
            # Per-stream calls share every weight (cross/attn/mlp); at the
            # production token count XLA's matmuls are already full-width
            # (M = N*T = 8192), so folding the k streams into the batch dim
            # was measured perf-NEUTRAL-to-negative on v5e (the fold's
            # jnp.tile materializations cost ~2.5% e2e) — keep the loop.
            xq = layer_norm(x)
            streams = [x + cross(xq, cond, cond)]
            if msk6 is not None:        # absent under use_gt_mask=True
                streams.append(x + cross(xq, msk6, msk6))
            if msk_line is not None:    # absent under use_line_mask=False
                streams.append(x + cross(xq, msk_line, msk_line))
            if r is not None:
                streams.append(x + cross(xq, r, r))
            return tuple(backbone(s) for s in streams)  # (x1, x2, x3[, x4])
        elif self.mode == "seq":
            obs = CrossAttention(self.hidden_size, self.num_heads, self.dtype,
                                 self.quant, name="cross_obs_attn")
            act = CrossAttention(self.hidden_size, self.num_heads, self.dtype,
                                 self.quant, name="cross_attn_act")
            x = x + obs(layer_norm(x), msk6, msk6)
            x = x + cross(layer_norm(x), cond, cond)
            x = x + act(layer_norm(x), msk_line, msk_line)
            return (backbone(x),)
        elif self.mode == "one":
            x = x + cross(layer_norm(x), cond, cond)
            return (backbone(x),)
        raise ValueError(self.mode)


class FinalLayer(nn.Module):
    """adaLN final projection; for fused multi-stream input the timestep
    embedding is tiled ``n_streams`` times (reference FinalLayer2)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    n_streams: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        if self.n_streams > 1:
            t_emb = jnp.tile(t_emb, (1, self.n_streams))
        ada = nn.Dense(
            2 * self.hidden_size, dtype=self.dtype,
            kernel_init=zeros_init, bias_init=zeros_init,
            name="adaLN_modulation_1",
        )(nn.silu(t_emb))
        shift, scale = jnp.split(ada, 2, axis=-1)
        x = modulate(layer_norm(x), shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, kernel_init=zeros_init, bias_init=zeros_init,
            name="linear",
        )(x)


def unpatchify(x: jnp.ndarray, patch: int, channels: int) -> jnp.ndarray:
    """(N, T, p*p*C) -> NHWC (N, h*p, w*p, C), row-major patches."""
    n, t, _ = x.shape
    h = w = int(round(t**0.5))
    x = x.reshape(n, h, w, patch, patch, channels)
    x = jnp.einsum("nhwpqc->nhpwqc", x)
    return x.reshape(n, h * patch, w * patch, channels)


class DiT(nn.Module):
    """DvD conditioning DiT. See module docstring."""

    input_size: int = 64
    patch_size: int = 2
    in_channels: int = 2
    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    time_freq_size: int = 256
    separate_cross_attn: str = "para"
    tv: bool = True
    chain_blocks: bool = False
    dtype: Dtype = jnp.float32
    # dynamic-int8 serving path (ops/quant.py): quantizes the DiT block +
    # SATRN decoder matmuls; embedders/adaLN/final layer stay fp.  A
    # TPU-native extra (no reference equivalent), default off.
    quant: bool = False

    @property
    def n_streams(self) -> int:
        return 4 if self.tv else 3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                    # (N, S, S, 2) noisy flow latent
        t: jnp.ndarray,                    # (N,) model-facing timesteps
        *,
        y512: jnp.ndarray,                 # (N, 512, 512, 3) source image
        mask_cat: Optional[jnp.ndarray],   # (N, 512, 512, 1) doc mask
        mask_y512: Optional[jnp.ndarray],  # (N, S, S, 384) seg pyramid
        line_msk: Optional[jnp.ndarray],   # (N, S, S, 64) text-line feats
        init_flow: jnp.ndarray,            # (N, S, S, 2)
        init_feat: Optional[jnp.ndarray] = None,   # (N, S, S, 256)
        src_feat: Optional[jnp.ndarray] = None,    # external VGG cond
        # (train_VGG=False path, cross_model.py:608-610): replaces the
        # private pyramid's features for both cond and the tv seed
        seed_init_feat: Optional[jnp.ndarray] = None,  # (N,) bool: t == T-1
        remap_timesteps: bool = True,
        train: bool = False,
        # serving-only embedder bypasses (see embed_stream_tokens): the
        # c/m/l streams are step- and hypothesis-invariant, so the sampler
        # hoists their patchify out of the DDIM loop.  When a *_tokens
        # input is given the corresponding raw input may be None.
        cond_tokens: Optional[jnp.ndarray] = None,     # (N, T, D)
        msk6_tokens: Optional[jnp.ndarray] = None,     # (N, T, D)
        line_tokens: Optional[jnp.ndarray] = None,     # (N, T, D)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        grid = self.input_size // self.patch_size
        pos = jnp.asarray(
            get_2d_sincos_pos_embed(self.hidden_size, grid), self.dtype
        )[None]

        embed = lambda name: PatchEmbed(self.patch_size, self.hidden_size,
                                        self.dtype, name=name)

        tokens = embed("obs_embedder")(x.astype(self.dtype)) + pos

        # sampling-mode timestep remap hack (cross_model.py:575-579)
        if remap_timesteps:
            t = jnp.where(t > 600.0, 2.0, jnp.where(t > 300.0, 1.0, t))
        t_emb = TimestepEmbedder(
            self.hidden_size, self.time_freq_size, self.dtype, name="t_embedder"
        )(t)

        # conditioning pyramid over image (+ mask channel); with external
        # src_feat the private pyramid is bypassed (cross_model.py:608-610;
        # its params still init for checkpoint-shape parity)
        if mask_cat is not None:
            y512 = jnp.concatenate([y512, mask_cat], axis=-1)
        if src_feat is None or self.is_initializing():
            feat = ConditioningPyramid(
                self.input_size, self.dtype, name="pyramid"
            )(y512.astype(self.dtype))  # (N, 64, 64, 256)
            if self.input_size in (16, 32):
                feat = resize_bilinear(
                    feat, (self.input_size, self.input_size), True)
        if src_feat is not None:
            feat = src_feat.astype(self.dtype)
        if cond_tokens is not None and not self.is_initializing():
            assert src_feat is not None, \
                "cond_tokens bypass still needs src_feat (tv seed + return)"
            cond = cond_tokens.astype(self.dtype)
        else:
            cond = embed("c_embedder")(feat) + pos
        msk6 = None
        if msk6_tokens is not None and not self.is_initializing():
            msk6 = msk6_tokens.astype(self.dtype)
        elif mask_y512 is not None:
            msk6 = embed("m_embedder")(mask_y512.astype(self.dtype)) + pos

        r = None
        if self.tv:
            if init_feat is None:
                init_feat = jnp.zeros(feat.shape, feat.dtype)
            if seed_init_feat is not None:
                # at t == T-1 the recurrent features are seeded from the
                # current pyramid output (cross_model.py:596-601)
                sel = jnp.asarray(seed_init_feat).reshape(-1, 1, 1, 1)
                init_feat = jnp.where(sel, feat, init_feat.astype(feat.dtype))
            r_in = jnp.concatenate(
                [init_flow.astype(self.dtype), init_feat.astype(self.dtype)], axis=-1
            )
            r = embed("r_embedder")(r_in) + pos

        msk_line = None
        if line_tokens is not None and not self.is_initializing():
            msk_line = line_tokens.astype(self.dtype)
        elif line_msk is not None:
            msk_line = embed("l_embedder")(line_msk.astype(self.dtype)) + pos

        blocks = [
            DiTBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                     self.separate_cross_attn, self.dtype, self.quant,
                     name=f"blocks_{i}")
            for i in range(self.depth)
        ]

        if self.separate_cross_attn == "para":
            if self.chain_blocks:
                streams = None
                for blk in blocks:
                    streams = blk(tokens, t_emb, cond, msk6, msk_line, r)
                    tokens = sum(streams) / len(streams)
            else:
                # reference dead-block semantics: every block reads the
                # original tokens and only the last survives
                # (cross_model.py:615-616).  At init we call every block so
                # their parameters exist (checkpoint-shape parity); at
                # apply we only trace the live one — this keeps the traced
                # HLO ~12x smaller, which matters for remote-compile
                # request limits, and is bit-identical.
                live = blocks if self.is_initializing() else blocks[-1:]
                for blk in live:
                    streams = blk(tokens, t_emb, cond, msk6, msk_line, r)
            # reference concat order is [x1, x2, x3(, x4)] (cross_model.py:619-623)
            fused = jnp.concatenate(list(streams), axis=-1)  # (N, T, k*D)
            n, tt, d = fused.shape
            g = int(round(tt**0.5))
            fused_img = fused.reshape(n, g, g, d)
            k = len(streams)
            dec = satrn.Decoder(
                n_layers=6, n_head=6, d_k=64 * k, d_v=64 * k,
                d_model=self.hidden_size * k, n_position=self.input_size // 2,
                d_inner=2048, dtype=self.dtype, quant=self.quant, name="decoder",
            )(fused_img, deterministic=not train, use_running_average=not train)
            out = FinalLayer(
                self.hidden_size * k, self.patch_size, self.in_channels,
                n_streams=k, dtype=self.dtype, name="final_layer2",
            )(dec, t_emb)
        else:
            for blk in blocks:
                (tokens,) = blk(tokens, t_emb, cond, msk6, msk_line, r)
            out = FinalLayer(
                self.hidden_size, self.patch_size, self.in_channels,
                n_streams=1, dtype=self.dtype, name="final_layer",
            )(tokens, t_emb)

        pred = unpatchify(out, self.patch_size, self.in_channels)
        pred = pred.astype(jnp.float32) + init_flow.astype(jnp.float32)
        return pred, feat.astype(jnp.float32)


# size registry mirroring the reference DiT_models2 (cross_model.py:730-784)
DIT_CONFIGS = {
    "DiT-XL/2": dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16),
    "DiT-XL/4": dict(depth=28, hidden_size=1152, patch_size=4, num_heads=16),
    "DiT-XL/8": dict(depth=28, hidden_size=1152, patch_size=8, num_heads=16),
    "DiT-L/2": dict(depth=24, hidden_size=1024, patch_size=2, num_heads=16),
    "DiT-L/4": dict(depth=24, hidden_size=1024, patch_size=4, num_heads=16),
    "DiT-L/8": dict(depth=24, hidden_size=1024, patch_size=8, num_heads=16),
    "DiT-B/2": dict(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "DiT-B/4": dict(depth=12, hidden_size=768, patch_size=4, num_heads=12),
    "DiT-B/8": dict(depth=12, hidden_size=768, patch_size=8, num_heads=12),
    "DiT-S/2": dict(depth=12, hidden_size=384, patch_size=2, num_heads=6),
    "DiT-S/4": dict(depth=12, hidden_size=384, patch_size=4, num_heads=6),
    "DiT-S/8": dict(depth=12, hidden_size=384, patch_size=8, num_heads=6),
    # ours: tiny config for CPU tests / smoke runs
    "DiT-mini": dict(depth=2, hidden_size=48, patch_size=2, num_heads=3),
}


def make_dit(variant: str = "DiT-S/2", **kwargs) -> DiT:
    cfg = dict(DIT_CONFIGS[variant])
    cfg.update(kwargs)
    return DiT(**cfg)
