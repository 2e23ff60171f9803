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


def test_attention_shard_map_dispatch_cpu_mesh():
    """The scaled_dot_attention SPMD branch: under a multi-device data
    mesh the fused kernel must run per-shard via shard_map (pallas_call
    is unpartitionable).  Validate with the interpret-mode kernel on the
    8-device CPU mesh, value + grad vs the jnp formulation."""
    import numpy as np
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dvd_tpu.ops.pallas.attention import attention
    from dvd_tpu.ops.pallas.spmd import shard_batch0

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))

    n, h, t, d = 8, 2, 32, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (n, h, t, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (n, h, t, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (n, h, t, d))
    scale = 1.0 / d ** 0.5

    def ref(q_, k_, v_):
        logits = jnp.einsum("nhqd,nhkd->nhqk", q_, k_) * scale
        return jnp.einsum("nhqk,nhkd->nhqd",
                          jax.nn.softmax(logits, axis=-1), v_)

    with mesh:
        sh = NamedSharding(mesh, P("data"))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        f = shard_batch0(
            lambda a, b, c: attention(a, b, c, scale, interpret=True),
            mesh, n_in=3)
        out = jax.jit(f)(qs, ks, vs)
        g = jax.jit(jax.grad(lambda a: f(a, ks, vs).sum()))(qs)

    ref_out = ref(q, k, v)
    ref_g = jax.grad(lambda a: ref(a, k, v).sum())(q)
    assert jnp.abs(out - ref_out).max() < 1e-5
    assert jnp.abs(g - ref_g).max() < 1e-4
