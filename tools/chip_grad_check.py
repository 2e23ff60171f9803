#!/usr/bin/env python
"""Real-chip parity + perf check of the warp_const_src VJP kernels.

Parity on a fully random grid (worst case for the strip-mined loops and
for corner/validity handling); perf on a smooth dewarp-like flow (the
actual loss regime — the kernel's strip mining exploits coordinate
locality; a random grid makes every tile touch the whole plane and the
XLA gather wins there, which the loss path never hits)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dvd_tpu.ops.grid_sample import grid_sample, _warp_const_src_pallas
from dvd_tpu.utils.bench_timing import make_fuse, timed_ms

key = jax.random.PRNGKey(0)
n, h, w, c = 8, 512, 512, 2
img = jax.random.uniform(key, (n, h, w, c))
ct = jax.random.normal(jax.random.fold_in(key, 2), (n, h, w, c))


def loss_ref(g):
    return jnp.vdot(grid_sample(jax.lax.stop_gradient(img), g,
                                align_corners=True,
                                padding_mode="zeros"), ct)


def loss_pal(g):
    return jnp.vdot(_warp_const_src_pallas(img, g), ct)


# ---- parity on the adversarial random grid -----------------------------
grid_rand = jax.random.uniform(jax.random.fold_in(key, 1), (n, h, w, 2),
                               minval=-1.2, maxval=1.2)
jr = jax.jit(jax.grad(loss_ref))
jp = jax.jit(jax.grad(loss_pal))
gr, gp = jr(grid_rand), jp(grid_rand)
err = float(jnp.abs(gr - gp).max())
print("random-grid grad max err:", err,
      "rel:", err / float(jnp.abs(gr).max()))

# ---- perf on a smooth dewarp-like flow ---------------------------------
yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, h), jnp.linspace(-1, 1, w),
                      indexing="ij")
flow = 0.08 * jnp.stack([jnp.sin(3 * yy) * xx, jnp.cos(3 * xx) * yy], -1)
grid_smooth = jnp.broadcast_to((jnp.stack([xx, yy], -1) + flow) * 0.987,
                               (n, h, w, 2))
gs_, gp_ = jr(grid_smooth), jp(grid_smooth)
err_s = float(jnp.abs(gs_ - gp_).max())
print("smooth-grid grad max err:", err_s)

fuse = make_fuse()
print("xla    fwd+grad ms:", round(timed_ms(jr, grid_smooth, iters=10,
                                            fuse=fuse), 2))
print("pallas fwd+grad ms:", round(timed_ms(jp, grid_smooth, iters=10,
                                            fuse=fuse), 2))
