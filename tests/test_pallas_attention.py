"""Pallas fused-attention kernel vs jnp reference (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.models.layers import scaled_dot_attention
from dvd_tpu.ops.pallas.attention import fused_attention


@pytest.mark.parametrize("shape", [
    (2, 6, 1024, 64),    # DiT-S/2 self-attention
    (1, 6, 1024, 256),   # SATRN decoder (tv, d_k=256)
    (2, 6, 64, 192),     # SATRN 3-stream at latent 16
])
def test_fused_attention_matches_reference(shape):
    b, h, t, d = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3)

    want = np.asarray(scaled_dot_attention(q, k, v))
    got = np.asarray(fused_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_fused_attention_cross_lengths():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 64, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 256, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 256, 64).astype(np.float32))
    want = np.asarray(scaled_dot_attention(q, k, v))
    got = np.asarray(fused_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_attention_custom_vjp_matches_autodiff():
    """The analytic backward (paired with the Pallas forward) must match
    jnp autodiff through the reference formulation."""
    from dvd_tpu.ops.pallas.attention import attention

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 3, 64, 32).astype(np.float32) * 0.4)
    k = jnp.asarray(rng.randn(2, 3, 64, 32).astype(np.float32) * 0.4)
    v = jnp.asarray(rng.randn(2, 3, 64, 32).astype(np.float32) * 0.4)
    scale = 1.0 / np.sqrt(32)

    def ref_loss(q, k, v):
        return jnp.sum(jnp.sin(scaled_dot_attention(q, k, v, scale=scale)))

    def fused_loss(q, k, v):
        return jnp.sum(jnp.sin(attention(q, k, v, scale, True)))

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-5, rtol=3e-5)
