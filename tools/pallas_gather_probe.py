#!/usr/bin/env python
"""Probe Mosaic support for the primitives the Pallas unwarp kernel needs:

1. lane-wise dynamic gather: take_along_axis on an (8,128) vreg, axis=1
2. dynamic-bound fori_loop whose bounds come from a vector reduction
3. dynamic row slice img_ref[pl.ds(row, 8), ...] with a traced row index
4. scalar extraction from a vector reduction (jnp.min -> loop bound)

Run with --interpret for CPU interpreter mode, bare for the real chip.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = 64, 256

    def kernel(img_ref, yidx_ref, xidx_ref, out_ref):
        # out[i, j] = img[y[i,j], x[i,j]] via strip-mined select-accumulate
        y = yidx_ref[:]              # (8, 128) int32 in [0, H)
        x = xidx_ref[:]              # (8, 128) int32 in [0, W)
        ymin = jnp.min(y)
        ymax = jnp.max(y)
        xmin = jnp.min(x)
        xmax = jnp.max(x)
        ys0 = ymin // 8
        ys1 = ymax // 8 + 1
        xs0 = xmin // 128
        xs1 = xmax // 128 + 1

        acc = jnp.zeros((8, 128), jnp.float32)

        def ybody(ys, acc):
            def xbody(xs, acc):
                blk = img_ref[pl.ds(ys * 8, 8), pl.ds(xs * 128, 128)]
                ymod = y - ys * 8
                xmod = x - xs * 128
                hit = ((ymod >= 0) & (ymod < 8) & (xmod >= 0) & (xmod < 128))
                ymodc = jnp.clip(ymod, 0, 7)
                xmodc = jnp.clip(xmod, 0, 127)
                for r in range(8):
                    row = blk[r:r + 1, :]                     # (1, 128)
                    row8 = jnp.broadcast_to(row, (8, 128))
                    g = jnp.take_along_axis(row8, xmodc, axis=1)
                    acc = acc + jnp.where(hit & (ymodc == r), g, 0.0)
                return acc
            return jax.lax.fori_loop(xs0, xs1, xbody, acc)

        acc = jax.lax.fori_loop(ys0, ys1, ybody, acc)
        out_ref[:] = acc

    img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    key = jax.random.PRNGKey(0)
    # indices concentrated in a sub-window (exercises the dynamic bounds)
    y = jax.random.randint(key, (8, 128), 13, 36)
    x = jax.random.randint(jax.random.fold_in(key, 1), (8, 128), 100, 230)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=args.interpret,
    )
    out = jax.jit(fn)(img, y, x)
    ref = img[np.asarray(y), np.asarray(x)]
    err = float(jnp.abs(out - ref).max())
    print("max_err", err)
    assert err == 0.0, "MISMATCH"
    print("PRIMITIVES_OK")


if __name__ == "__main__":
    main()
