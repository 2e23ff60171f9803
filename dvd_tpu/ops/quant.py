"""Dynamic int8 quantized matmul for serving (opt-in, ``model.quantize``).

The v5e MXU runs int8 at 2x its bf16 rate (394 vs 197 TOP/s; measured
~2.1x compute-only on an 8k x 4.6k x 4.6k matmul — see
``docs/ROOFLINE.md``).  The weights in this framework are jit *arguments*
(never baked into HLO), so quantization happens inside the traced
computation: per-output-channel weight scales, per-token (row) activation
scales, int32 accumulation, fp rescale.  This is standard dynamic W8A8:

    y_ij = sum_k x_ik w_kj  ~=  xs_i * ws_j * sum_k q(x)_ik q(w)_kj

No reference-parity constraint applies — the reference (torch/CUDA) has
no quantized path at all; this is a TPU-native extra, default-off.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_rows(x: jnp.ndarray):
    """Quantize along the last axis: returns (int8 values, per-row scale).

    Exposed so callers can quantize a shared activation ONCE for several
    projections of the same tensor (q/k/v) — the quantize pass is pure
    bandwidth and is a significant share of the dynamic-int8 cost at
    d~1536 (docs/ROOFLINE.md)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(s, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_dense(
    x: jnp.ndarray,               # (..., K) activations
    kernel: jnp.ndarray,          # (K, N) weights (any float dtype)
    bias: Optional[jnp.ndarray] = None,   # (N,)
    prequant=None,                # optional (xq, xs) from quantize_rows(x)
    out_dtype=None,
) -> jnp.ndarray:
    """W8A8 dynamic-quantized ``x @ kernel + bias``; returns ``x.dtype``
    (or ``out_dtype``)."""
    xq, xs = prequant if prequant is not None else quantize_rows(x)
    wq, ws = quantize_rows(kernel.astype(jnp.float32).T)  # per-col of kernel
    y = jax.lax.dot_general(
        xq, wq.T,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * xs * ws.reshape((1,) * (xq.ndim - 1) + (-1,))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype if out_dtype is not None else x.dtype)
