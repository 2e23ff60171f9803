#!/usr/bin/env python
"""Probe alternative XLA gather formulations for the grid_sample hot path.

The 512^2 unwarp is ~20 ms at batch 4 on v5e with the current 4-corner
``jnp.take`` formulation — pure gather, no FLOPs.  This tool times isolated
variants at production shapes so the winning formulation is chosen on
measurement, not folklore.  Not part of the library; results inform
dvd_tpu/ops/grid_sample.py.
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    n, p, c = args.batch, args.size, 3
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (n, p, p, c), jnp.float32)
    # smooth dewarp-like grid: identity + small smooth flow
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, p), jnp.linspace(-1, 1, p),
                          indexing="ij")
    flow = 0.05 * jnp.stack([jnp.sin(3 * yy) * jnp.cos(2 * xx),
                             jnp.cos(2 * yy) * jnp.sin(3 * xx)], -1)
    grid = jnp.broadcast_to(
        jnp.stack([xx, yy], -1) + flow, (n, p, p, 2))

    gx = (grid[..., 0] + 1.0) * 0.5 * (p - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (p - 1)
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    tx = gx - x0; ty = gy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, p - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, p - 2)

    from dvd_tpu.utils.bench_timing import make_fuse, timed_ms

    fuse = make_fuse()

    def timed(name, fn, *a):
        ms = timed_ms(jax.jit(fn), *a, iters=args.iters, fuse=fuse)
        print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)

    img_flat = img.reshape(n * p * p, c)
    boff = (jnp.arange(n, dtype=jnp.int32) * (p * p))[:, None, None]

    def v_take4(img_flat, y0i, x0i, tx, ty):
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                idx = boff + (y0i + dy) * p + (x0i + dx)
                w = (ty if dy else 1 - ty) * (tx if dx else 1 - tx)
                vals = jnp.take(img_flat, idx.reshape(-1), axis=0)
                out = out + vals.reshape(n, p, p, c) * w[..., None]
        return out

    timed("take4_flat (current)", v_take4, img_flat, y0i, x0i, tx, ty)

    def v_take1(img_flat, y0i, x0i, tx, ty):
        # one fused gather for all 4 corners
        idx00 = boff + y0i * p + x0i
        idx = jnp.stack([idx00, idx00 + 1, idx00 + p, idx00 + p + 1], 0)
        vals = jnp.take(img_flat, idx.reshape(-1), axis=0)
        vals = vals.reshape(4, n, p, p, c)
        w = jnp.stack([(1 - ty) * (1 - tx), (1 - ty) * tx,
                       ty * (1 - tx), ty * tx], 0)[..., None]
        return (vals * w).sum(0)

    timed("take1_fused_corners", v_take1, img_flat, y0i, x0i, tx, ty)

    def v_rowpair(img, y0i, x0i, tx, ty):
        # gather whole (C-contig) pixels from a row-pair-flattened image:
        # two gathers of (row y0, row y0+1) horizontal neighbors
        out = 0.0
        for dy in (0, 1):
            idx = boff + (y0i + dy) * p + x0i
            v0 = jnp.take(img_flat, idx.reshape(-1), axis=0).reshape(n, p, p, c)
            v1 = jnp.take(img_flat, (idx + 1).reshape(-1), axis=0).reshape(n, p, p, c)
            row = v0 * (1 - tx)[..., None] + v1 * tx[..., None]
            out = out + row * (ty if dy else 1 - ty)[..., None]
        return out

    timed("rowpair", v_rowpair, img, y0i, x0i, tx, ty)

    def v_u8(img_u8, y0i, x0i, tx, ty):
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                idx = boff + (y0i + dy) * p + (x0i + dx)
                w = (ty if dy else 1 - ty) * (tx if dx else 1 - tx)
                vals = jnp.take(img_u8, idx.reshape(-1), axis=0)
                out = out + vals.reshape(n, p, p, c).astype(jnp.float32) * w[..., None]
        return out

    img_u8 = (img_flat * 255).astype(jnp.uint8)
    timed("take4_uint8", v_u8, img_u8, y0i, x0i, tx, ty)

    def v_taa(img, y0i, x0i, tx, ty):
        # two-stage take_along_axis: rows first (axis 1), then cols (axis 2)
        # NOT exact-equivalent (gathers 2 full rows per output row pair is
        # wrong for arbitrary grids) -- only for speed signal: per-pixel
        # take_along_axis on both axes.
        out = 0.0
        for dy in (0, 1):
            rows = jnp.take_along_axis(
                img, jnp.clip(y0i + dy, 0, p - 1)[..., None], axis=1)
            for dx in (0, 1):
                v = jnp.take_along_axis(
                    rows, jnp.clip(x0i + dx, 0, p - 1)[..., None], axis=2)
                w = (ty if dy else 1 - ty) * (tx if dx else 1 - tx)
                out = out + v * w[..., None]
        return out

    timed("take_along_axis_2d", v_taa, img, y0i, x0i, tx, ty)

    def v_vmap(img, y0i, x0i, tx, ty):
        def one(im, yy0, xx0, ttx, tty):
            imf = im.reshape(p * p, c)
            out = 0.0
            for dy in (0, 1):
                for dx in (0, 1):
                    idx = (yy0 + dy) * p + (xx0 + dx)
                    w = (tty if dy else 1 - tty) * (ttx if dx else 1 - ttx)
                    out = out + jnp.take(imf, idx.reshape(-1), axis=0).reshape(
                        p, p, c) * w[..., None]
            return out
        return jax.vmap(one)(img, y0i, x0i, tx, ty)

    timed("vmap_per_image", v_vmap, img, y0i, x0i, tx, ty)

    # raw gather floor: one corner, no weights — lower bound for any
    # gather-based formulation
    def v_raw(img_flat, y0i, x0i):
        idx = boff + y0i * p + x0i
        return jnp.take(img_flat, idx.reshape(-1), axis=0)

    timed("raw_single_gather", v_raw, img_flat, y0i, x0i)

    # dynamic_slice-free floor: pure bandwidth copy of the same bytes
    timed("memcpy_floor", lambda x: x + 1.0, img)


if __name__ == "__main__" and "--slice22" not in sys.argv:
    main()


def probe_slice22():
    """Second-round probe: one gather per pixel fetching the whole 2x2
    corner patch via slice_sizes — 1M indices instead of 4M."""
    import argparse
    import jax
    import jax.numpy as jnp
    from jax import lax
    import json, time
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    n, p, c = args.batch, args.size, 3

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (n, p, p, c), jnp.float32)
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, p), jnp.linspace(-1, 1, p),
                          indexing="ij")
    flow = 0.05 * jnp.stack([jnp.sin(3 * yy) * jnp.cos(2 * xx),
                             jnp.cos(2 * yy) * jnp.sin(3 * xx)], -1)
    grid = jnp.broadcast_to(jnp.stack([xx, yy], -1) + flow, (n, p, p, 2))
    gx = (grid[..., 0] + 1.0) * 0.5 * (p - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (p - 1)
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    tx = (gx - x0); ty = (gy - y0)
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    from dvd_tpu.utils.bench_timing import make_fuse, timed_ms

    fuse = make_fuse()

    def timed(name, fn, *a):
        ms = timed_ms(jax.jit(fn), *a, iters=args.iters, fuse=fuse)
        print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gather22(im, sy, sx):
        starts = jnp.stack([sy.reshape(-1), sx.reshape(-1)], -1)
        return lax.gather(
            im, starts, dnums, slice_sizes=(2, 2, c),
            mode=lax.GatherScatterMode.CLIP)          # (P*P, 2, 2, C)

    def v22_raw(img, y0i, x0i):
        return jax.vmap(gather22)(img, y0i, x0i)

    timed("slice22_raw", v22_raw, img, y0i, x0i)

    def v22_full(img, y0i, x0i, tx, ty):
        # exact zeros-padding bilinear using the 2x2 patch gather
        sy = jnp.clip(y0i, 0, p - 2)
        sx = jnp.clip(x0i, 0, p - 2)
        patch = jax.vmap(gather22)(img, sy, sx)       # (N, P*P, 2, 2, C)
        patch = patch.reshape(n, p, p, 2, 2, c)
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi = y0i + dy
                xi = x0i + dx
                valid = ((yi >= 0) & (yi < p) & (xi >= 0) & (xi < p))
                py = jnp.clip(yi, 0, p - 1) - sy      # 0 or 1
                px = jnp.clip(xi, 0, p - 1) - sx
                v = jnp.where((py == 0)[..., None],
                              jnp.where((px == 0)[..., None],
                                        patch[..., 0, 0, :], patch[..., 0, 1, :]),
                              jnp.where((px == 0)[..., None],
                                        patch[..., 1, 0, :], patch[..., 1, 1, :]))
                w = (ty if dy else 1 - ty) * (tx if dx else 1 - tx)
                out = out + v * (valid * w)[..., None]
        return out

    timed("slice22_full_exact", v22_full, img, y0i, x0i, tx, ty)

    # interior fast path: no boundary handling (weights only) — measures
    # the combine cost floor
    def v22_interior(img, y0i, x0i, tx, ty):
        sy = jnp.clip(y0i, 0, p - 2)
        sx = jnp.clip(x0i, 0, p - 2)
        patch = jax.vmap(gather22)(img, sy, sx).reshape(n, p, p, 2, 2, c)
        w00 = ((1 - ty) * (1 - tx))[..., None]
        w01 = ((1 - ty) * tx)[..., None]
        w10 = (ty * (1 - tx))[..., None]
        w11 = (ty * tx)[..., None]
        return (patch[..., 0, 0, :] * w00 + patch[..., 0, 1, :] * w01 +
                patch[..., 1, 0, :] * w10 + patch[..., 1, 1, :] * w11)

    timed("slice22_interior", v22_interior, img, y0i, x0i, tx, ty)


if __name__ == "__main__" and "--slice22" in __import__("sys").argv:
    __import__("sys").argv.remove("--slice22")
    probe_slice22()
    raise SystemExit(0)
