"""Pure-transformer alternative denoiser (``train_mode =
'stage_1_transformer'``).

Behavioral parity with reference ``improved_diffusion/transformer.py``
(``DDIMWithTransformer``): conv projection 68ch -> model_channels, then
``num_layers`` pre blocks + bottleneck + ``num_layers`` post blocks of
post-norm self-attention over the flattened H*W tokens, with the timestep
embedding added to the token sequence before every block; SiLU + 3x3 conv
head; residual ``+init_flow``.

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from dvd_tpu.models.layers import CrossAttention, timestep_embedding

Dtype = Any


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    ff_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn = CrossAttention(self.dim, self.num_heads, self.dtype, name="attn")
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            x + attn(x, x, x))
        y = nn.Dense(self.ff_dim, dtype=self.dtype, name="ffn_0")(x)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn_2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + y)


class TransformerDenoiser(nn.Module):
    in_channels: int = 68
    model_channels: int = 128
    out_channels: int = 2
    num_heads: int = 4
    num_layers: int = 6
    ff_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, *,
                 src_feat: Optional[jnp.ndarray] = None,
                 init_flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        mc = self.model_channels
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_0")(
            timestep_embedding(t, mc))
        emb = nn.Dense(mc, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        if init_flow is not None:
            x = jnp.concatenate([src_feat, x, init_flow], axis=-1)
            x = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype,
                        name="x_projection")(x)
        n, h, w, c = x.shape
        tok = x.reshape(n, h * w, c)
        for i in range(self.num_layers):
            tok = TransformerBlock(mc, self.num_heads, self.ff_dim, self.dtype,
                                   name=f"input_blocks_{i}")(tok + emb[:, None])
        tok = TransformerBlock(mc, self.num_heads, self.ff_dim, self.dtype,
                               name="middle_block")(tok + emb[:, None])
        for i in range(self.num_layers):
            tok = TransformerBlock(mc, self.num_heads, self.ff_dim, self.dtype,
                                   name=f"output_blocks_{i}")(tok + emb[:, None])
        y = tok.reshape(n, h, w, c)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="out_1")(nn.silu(y))
        if init_flow is not None:
            y = y + init_flow
        return y
