"""Fused multi-head attention Pallas kernel (TPU).

Workload analysis for this framework (see SURVEY.md §5 "long-context"):
sequences are at most 1024 tokens (32x32 patches), head dims 64..256, no
masking.  K and V for a whole head fit comfortably in VMEM (1024 x 256
fp32 = 1 MB), so the optimal kernel is a *single-pass* fused attention:
each grid step loads one query block plus the full K/V for its
(batch, head), computes the logits on the MXU, softmaxes in fp32, and
applies V — the (T x T) logits never touch HBM.  This is simpler and
faster here than a streaming flash-attention (no online-softmax carry
needed when KV fits on-chip).

Non-128-multiple head dims are zero-padded up (zeros are exact no-ops for
both the logit contraction and the V application).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # block shapes carry a leading size-1 grid axis
    q = q_ref[0]                       # (bq, dh)
    k = k_ref[0]                       # (T, dh)
    v = v_ref[0]                       # (T, dh)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                           # (bq, T) fp32
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def fused_attention(
    q: jnp.ndarray,                    # (B, H, Tq, Dh)
    k: jnp.ndarray,                    # (B, H, Tk, Dh)
    v: jnp.ndarray,                    # (B, H, Tk, Dh)
    scale: float = None,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)

    dh_p = _round_up(dh, 128)
    bq = min(block_q, _round_up(tq, 8))
    tq_pb = _round_up(tq, bq)
    tk_p = _round_up(tk, 8)

    def pad(x, t_to, d_to):
        t_from, d_from = x.shape[2], x.shape[3]
        if t_to == t_from and d_to == d_from:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_to - t_from),
                           (0, d_to - d_from)))

    qp = pad(q, tq_pb, dh_p).reshape(b * h, tq_pb, dh_p)
    kp = pad(k, tk_p, dh_p).reshape(b * h, tk_p, dh_p)
    vp = pad(v, tk_p, dh_p).reshape(b * h, tk_p, dh_p)
    # padded KV rows would contribute exp(0) to the softmax denominator —
    # push their logits to -inf via a -1e30 key bias trick: zero-padded
    # keys give logit 0, so instead mask by padding V with zeros AND
    # subtracting from the softmax. Cleanest: only allow exact tk.
    assert tk_p == tk, "kv length must be a multiple of 8"

    grid = (b * h, tq_pb // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pb, dh_p), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, dh_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, dh_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh_p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * tq_pb * tk * dh_p,
            bytes_accessed=(qp.size + kp.size + vp.size) * 4,
            transcendentals=b * h * tq_pb * tk,
        ),
    )(qp, kp, vp)
    out = out.reshape(b, h, tq_pb, dh_p)[:, :, :tq, :dh]
    return out


# --------------------------------------------------------------------------
# Differentiable wrapper + model-facing dispatch
# --------------------------------------------------------------------------
#
# Pallas kernels have no automatic VJP.  Attention sits in the training
# graph (every DiT block), so the fused forward is paired with an
# analytic jnp backward that recomputes the probabilities (flash-style
# rematerialization: the (Tq x Tk) logits are cheaper to recompute than
# to spill to HBM).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def attention(q, k, v, scale: float, interpret: bool = False):
    """Differentiable fused attention. (B, H, Tq, Dh) x (B, H, Tk, Dh)."""
    return fused_attention(q, k, v, scale=scale, interpret=interpret)


def _attention_fwd(q, k, v, scale, interpret):
    return attention(q, k, v, scale, interpret), (q, k, v)


def _attention_bwd(scale, interpret, res, g):
    q, k, v = res
    q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
    g32 = g.astype(jnp.float32)
    s = jnp.einsum("nhqd,nhkd->nhqk", q32, k32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("nhqk,nhqd->nhkd", p, g32)
    dp = jnp.einsum("nhqd,nhkd->nhqk", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("nhqk,nhkd->nhqd", ds, k32) * scale
    dk = jnp.einsum("nhqk,nhqd->nhkd", ds, q32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


attention.defvjp(_attention_fwd, _attention_bwd)


def use_fused_attention(q_shape, k_shape) -> bool:
    """True when the fused kernel applies: TPU backend, KV length a
    sublane multiple, and whole-head K/V small enough for VMEM."""
    import os

    if os.environ.get("DVD_TPU_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    tk, dh = k_shape[2], k_shape[3]
    dh_p = _round_up(dh, 128)
    # q block + K + V + logits, fp32, with headroom under ~16MB VMEM
    vmem = (256 * dh_p + 2 * tk * dh_p + 256 * tk) * 4
    return tk % 8 == 0 and vmem < 6 * 1024 * 1024
