"""Shared NN building blocks (flax.linen, NHWC).

Parity targets (behavior, not code): timm ``Attention``/``Mlp``/
``PatchEmbed`` as used by the reference DiT (``cross_model.py:7``),
torch ``nn.MultiheadAttention`` (the DiT cross-attention branches), the
GLIDE-style sinusoidal timestep embedder (``cross_model.py:97-139``), and
the MAE 2D sin-cos positional embedding (``cross_model.py:677-722``).

Parameter tree names intentionally mirror the reference module names so the
torch->jax checkpoint converter is a pure name map.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation: ``x * (1 + scale) + shift`` with (N, D) conditioners."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm without learnable affine (elementwise_affine=False)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def scaled_dot_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: Optional[float] = None
) -> jnp.ndarray:
    """(N, H, Tq, Dh) x (N, H, Tk, Dh) attention, softmax in fp32.

    On TPU this dispatches to the fused Pallas kernel
    (:mod:`dvd_tpu.ops.pallas.attention`) — single pass, logits never
    leave VMEM — with an analytic jnp VJP for the training path.  The
    jnp formulation below is the reference (and the CPU/GPU path).
    """
    dh = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)

    from dvd_tpu.ops.pallas.attention import attention, use_fused_attention
    from dvd_tpu.ops.pallas.spmd import ambient_mesh, batch_shards, shard_batch0

    if use_fused_attention(q.shape, k.shape):
        mesh = ambient_mesh()
        if mesh is None:
            return attention(q, k, v, scale)
        # multi-device trace: pallas_call is unpartitionable — run the
        # kernel per data-shard (batch-pointwise; under pure DP the heads
        # are replicated, so this is the natural layout).  With a >1
        # model (TP) axis the heads may be sharded and forcing a
        # data-only layout would reshard them, so fall through to the
        # jnp formulation there — XLA partitions it natively.
        pure_dp = all(mesh.shape[a] == 1 for a in mesh.axis_names[1:])
        if pure_dp and q.shape[0] % batch_shards(mesh) == 0:
            f = lambda q_, k_, v_: attention(q_, k_, v_, scale)
            return shard_batch0(f, mesh, n_in=3)(q, k, v)

    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, precision=jax.lax.Precision.DEFAULT)
    logits = logits.astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", probs, v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    n, t, d = x.shape
    return x.reshape(n, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    n, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(n, t, h * dh)


class QDense(nn.Module):
    """Drop-in for ``nn.Dense`` with an optional dynamic-int8 matmul
    (:func:`dvd_tpu.ops.quant.int8_dense`).  The parameter tree ("kernel",
    "bias", fp32 params) is identical to ``nn.Dense``, so checkpoints and
    the torch converter are unaffected; ``quant`` only changes the traced
    compute.  Serving-only: no custom VJP is provided (training paths
    construct models with ``quant=False``, the default)."""

    features: int
    use_bias: bool = True
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, prequant=None) -> jnp.ndarray:
        """``prequant``: optional ``quantize_rows(x)`` result shared by
        several projections of the same tensor (quant path only)."""
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        x = x.astype(self.dtype)
        if self.quant:
            from dvd_tpu.ops.quant import int8_dense

            return int8_dense(x, kernel, bias, prequant=prequant,
                              out_dtype=self.dtype)
        y = x @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class SelfAttention(nn.Module):
    """timm-style fused-QKV self attention (qkv_bias=True)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = lambda f, name: QDense(f, True, self.quant, self.dtype, name=name)
        qkv = dense(3 * self.dim, "qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = scaled_dot_attention(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
        )
        return dense(self.dim, "proj")(merge_heads(out))


class CrossAttention(nn.Module):
    """torch ``nn.MultiheadAttention(batch_first=True)`` equivalent
    (separate q/k/v projections with bias, output projection with bias)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
        dense = lambda name: QDense(self.dim, True, self.quant, self.dtype, name=name)
        pq = pk = pv = None
        if self.quant:
            # quantize each distinct input once (k/v usually share a tensor)
            from dvd_tpu.ops.quant import quantize_rows

            pq = quantize_rows(query.astype(self.dtype))
            pk = pq if key is query else quantize_rows(key.astype(self.dtype))
            pv = pk if value is key else (
                pq if value is query else quantize_rows(value.astype(self.dtype)))
        q = dense("q_proj")(query, pq)
        k = dense("k_proj")(key, pk)
        v = dense("v_proj")(value, pv)
        out = scaled_dot_attention(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
        )
        return dense("out_proj")(merge_heads(out))


class Mlp(nn.Module):
    """timm Mlp: fc1 -> GELU(tanh) -> fc2."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = QDense(self.hidden_dim, True, self.quant, self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return QDense(self.out_dim, True, self.quant, self.dtype, name="fc2")(x)


class PatchEmbed(nn.Module):
    """Conv patchify: NHWC image -> (N, T, D) tokens (row-major patches)."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, kernel_size=(p, p), strides=(p, p),
            padding="VALID", dtype=self.dtype, name="proj",
        )(x)
        n, h, w, d = x.shape
        return x.reshape(n, h * w, d)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """GLIDE sinusoidal embedding: cat([cos, sin]) ordering
    (reference ``cross_model.py:111-134``)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_embed_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.freq_embed_size).astype(self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_0")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_2")(x)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """MAE-style fixed 2D sin-cos positional embedding
    (sin/cos ordering per axis, h-embedding first)."""

    def one_d(dim: int, pos: np.ndarray) -> np.ndarray:
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000.0**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first (reference :683-688)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = one_d(embed_dim // 2, grid[0])
    emb_w = one_d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with stored running statistics (the aux nets are
    always frozen/eval in the pipeline — reference ``geotr_core.py:884-886``,
    ``unet_model.py:23-24``)."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        ).value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


class BatchNorm(nn.Module):
    """Trainable BatchNorm (used inside the SATRN decoder's
    locality-aware feed-forward, which *is* part of the trainable DiT)."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        bn = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )
        return bn(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 (reference ``nn.py:13-20,103``)."""

    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gn = nn.GroupNorm(num_groups=min(self.num_groups, self.features), epsilon=1e-5)
        return gn(x.astype(jnp.float32)).astype(x.dtype)
