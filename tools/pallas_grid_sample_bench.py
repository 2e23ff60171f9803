#!/usr/bin/env python
"""On-chip A/B of the Pallas grid_sample gather vs the jnp/XLA path.

Production-like shape (batch-4 512^2 RGB, smooth dewarp flow). Prints
max|err| (expect ~1 ulp) and mean wall time per call for both paths.
Measured on v5e: jnp 20.0 ms vs pallas 4.6 ms (4.3x)."""
import time

import jax
import jax.numpy as jnp

from dvd_tpu.ops.grid_sample import grid_sample
from dvd_tpu.ops.pallas.grid_sample import grid_sample_pallas
from dvd_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

key = jax.random.PRNGKey(0)
n, p, c = 4, 512, 3
img = jax.random.uniform(key, (n, p, p, c))
yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, p), jnp.linspace(-1, 1, p), indexing="ij")
flow = 0.05 * jnp.stack([jnp.sin(3 * yy) * jnp.cos(2 * xx),
                         jnp.cos(2 * yy) * jnp.sin(3 * xx)], -1)
grid = jnp.broadcast_to((jnp.stack([xx, yy], -1) + flow) * 0.987, (n, p, p, 2))

f_ref = jax.jit(lambda i, g: grid_sample(i, g, align_corners=True, padding_mode="zeros"))
f_pal = jax.jit(lambda i, g: grid_sample_pallas(i, g, padding_mode="zeros"))

r = f_ref(img, grid); o = f_pal(img, grid)
err = float(jnp.abs(r - o).max())
print("max_err", err, flush=True)

fuse = jax.jit(lambda xs: sum(x.sum() for x in xs))
for name, f in [("jnp", f_ref), ("pallas", f_pal)]:
    outs = [f(img, grid) for _ in range(20)]
    float(fuse(outs))
    t0 = time.perf_counter()
    outs = [f(img, grid) for _ in range(20)]
    float(fuse(outs))
    print(name, round((time.perf_counter() - t0) / 20 * 1e3, 3), "ms", flush=True)
