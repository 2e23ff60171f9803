"""SATRN-style fusion decoder (the DiT's multi-stream fusion head).

Behavioral parity with the reference's mmocr-derived stack
(``cross_attn.py``): locality-aware feed-forward (1x1 -> depthwise 3x3 ->
1x1 convs, each Conv-BN-ReLU, no conv bias), adaptive 2D positional
encoding with learned per-sample H/W scales, and a pre-norm self-attention
decoder layer.  The reference's valid-ratio masking is always all-ones in
this pipeline (``cross_attn.py:443-451``) and therefore omitted.

Layout: tokens are (N, T, D); images NHWC.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dvd_tpu.models.layers import QDense, merge_heads, scaled_dot_attention, split_heads

Dtype = Any


def _satrn_sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """(n_position, d_hid): pos / 10000^(2*(j//2)/d); even cols sin, odd cos
    (reference ``cross_attn.py:122-134``)."""
    j = np.arange(d_hid)
    denom = 1.0 / np.power(10000.0, 2 * (j // 2) / d_hid)
    table = np.arange(n_position)[:, None].astype(np.float64) * denom[None, :]
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)


class _QConv1x1(nn.Module):
    """1x1 conv evaluated as a dynamic-int8 matmul; the parameter tree
    ("kernel", shape (1,1,Cin,Cout), lecun-normal) is identical to
    ``nn.Conv`` so checkpoints are unaffected (serving-only path)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from dvd_tpu.ops.quant import int8_dense

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features))
        return int8_dense(x.astype(self.dtype), kernel.reshape(cin, self.features))


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        if self.quant and self.kernel == 1 and self.groups == 1:
            x = _QConv1x1(self.features, self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features, (self.kernel, self.kernel), padding="SAME",
                feature_group_count=self.groups, use_bias=False,
                dtype=self.dtype, name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class LocalityAwareFeedforward(nn.Module):
    """1x1 expand -> depthwise 3x3 -> 1x1 project, each Conv-BN-ReLU."""

    d_in: int
    d_hid: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        x = ConvBNReLU(self.d_hid, 1, dtype=self.dtype, quant=self.quant,
                       name="conv1")(x, use_running_average)
        x = ConvBNReLU(
            self.d_hid, 3, groups=self.d_hid, dtype=self.dtype, name="depthwise_conv"
        )(x, use_running_average)
        return ConvBNReLU(self.d_in, 1, dtype=self.dtype, quant=self.quant,
                          name="conv2")(x, use_running_average)


class Adaptive2DPositionalEncoding(nn.Module):
    """x + h_scale(pool(x)) * h_sinusoid + w_scale(pool(x)) * w_sinusoid."""

    d_hid: int
    n_height: int
    n_width: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n, h, w, c = x.shape
        h_table = _satrn_sinusoid_table(self.n_height, self.d_hid)  # (nH, d)
        w_table = _satrn_sinusoid_table(self.n_width, self.d_hid)

        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,C)

        def scale_net(name: str) -> jnp.ndarray:
            y = nn.Conv(self.d_hid, (1, 1), dtype=self.dtype, name=f"{name}_0")(pooled)
            y = nn.relu(y)
            y = nn.Conv(self.d_hid, (1, 1), dtype=self.dtype, name=f"{name}_2")(y)
            return nn.sigmoid(y)

        h_scale = scale_net("h_scale")  # (N,1,1,C)
        w_scale = scale_net("w_scale")
        h_pos = jnp.asarray(h_table[:h], x.dtype)[None, :, None, :]   # (1,h,1,C)
        w_pos = jnp.asarray(w_table[:w], x.dtype)[None, None, :, :]   # (1,1,w,C)
        out = x + h_scale * h_pos + w_scale * w_pos
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class SATRNAttention(nn.Module):
    """Separate q/k/v projections without bias, temperature sqrt(d_k)
    (reference ``cross_attn.py:160-221``)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True):
        dim_k = self.n_head * self.d_k
        dim_v = self.n_head * self.d_v
        dense = lambda f, name: QDense(f, False, self.quant, self.dtype, name=name)
        pq = pk = pv = None
        if self.quant:
            # decoder self-attention: q/k/v are the same tensor — one
            # activation-quantize pass serves all three projections
            from dvd_tpu.ops.quant import quantize_rows

            pq = quantize_rows(q.astype(self.dtype))
            pk = pq if k is q else quantize_rows(k.astype(self.dtype))
            pv = pk if v is k else (
                pq if v is q else quantize_rows(v.astype(self.dtype)))
        qp = dense(dim_k, "linear_q")(q, pq)
        kp = dense(dim_k, "linear_k")(k, pk)
        vp = dense(dim_v, "linear_v")(v, pv)
        out = scaled_dot_attention(
            split_heads(qp, self.n_head),
            split_heads(kp, self.n_head),
            split_heads(vp, self.n_head),
            scale=1.0 / (self.d_k**0.5),
        )
        out = dense(self.d_model, "fc")(merge_heads(out))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class DecoderLayer(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int,
                 deterministic: bool = True, use_running_average: bool = True):
        n, t, c = x.shape
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = residual + SATRNAttention(
            self.n_head, self.d_model, self.d_k, self.d_v,
            self.dropout, self.dtype, self.quant, name="attn",
        )(y, y, y, deterministic)
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = y.reshape(n, h, w, c)
        y = LocalityAwareFeedforward(
            self.d_model, self.d_inner, self.dtype, self.quant, name="feed_forward"
        )(y, use_running_average)
        return residual + y.reshape(n, t, c)


class Decoder(nn.Module):
    """Stack of decoder layers over the concatenated DiT streams.

    Input NHWC (N, h, w, D_model); output tokens (N, h*w, D_model)
    (reference ``cross_attn.py:399-458``).
    """

    n_layers: int = 6
    n_head: int = 6
    d_k: int = 256
    d_v: int = 256
    d_model: int = 1536
    n_position: int = 32
    d_inner: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        n, h, w, c = feat.shape
        x = Adaptive2DPositionalEncoding(
            self.d_model, self.n_position, self.n_position,
            self.dropout, self.dtype, name="position_dec",
        )(feat, deterministic)
        x = x.reshape(n, h * w, c)
        for i in range(self.n_layers):
            x = DecoderLayer(
                self.d_model, self.d_inner, self.n_head, self.d_k, self.d_v,
                self.dropout, self.dtype, self.quant, name=f"layer_stack_{i}",
            )(x, h, w, deterministic, use_running_average)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
