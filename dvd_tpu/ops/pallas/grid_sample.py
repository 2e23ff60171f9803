"""Pallas TPU kernel for the grid_sample gather (the unwarp hot path).

Why this exists: XLA's TPU gather costs ~5 ns *per index* regardless of
slice size (measured on v5e, ``tools/gather_probe.py``), so the 4-corner
bilinear gather of a 512^2 batch-4 unwarp floors at ~20 ms — pure gather,
zero FLOPs.  This kernel keeps each image plane resident in VMEM and
turns the gather into strip-mined lane-shuffles:

- the output is tiled into (BAND x 128) vregs;
- per tile, the *dynamic* y/x bounding box of the sampled coordinates is
  reduced on the VPU and drives ``fori_loop``s over only the (8 x 128)
  source blocks the tile actually touches — smooth dewarping flows touch
  ~2-6 blocks per tile instead of the whole plane, and wild flows stay
  exact (the loops just run longer);
- within a block, each source row is sublane-broadcast and the two
  horizontal corners are fetched with lane-wise ``take_along_axis``
  (Mosaic ``tpu.dynamic_gather``, range 128), then mask-accumulated with
  the bilinear weights.

Exactness: identical corner/weight arithmetic to
:func:`dvd_tpu.ops.grid_sample.grid_sample` (torch ``F.grid_sample``
parity, ``align_corners=True``), f32 accumulation; the unit tests assert
allclose at 1e-6 vs the jnp path on both interpret and real backends.

Layout: the kernel consumes *planar* (N, C, H, W) images — NHWC's C=3
would waste 125/128 lanes.  The wrapper transposes in/out (one cheap XLA
transpose each way at 512^2; callers that can keep planar should).

Differentiation: :func:`gather_bilinear_grad_planar` below provides the
gradient w.r.t. the sample *coordinates* (used by
``dvd_tpu.ops.grid_sample.warp_const_src`` for the 512^2 composed-warp
training loss, where the warped source is ground truth and needs no
cotangent).  There is no image-gradient (scatter) kernel; warps that
need gradients w.r.t. the source stay on the differentiable jnp path
(they run at 64^2 where XLA's gather is not the bottleneck).

Reference hot kernel being replaced: ``datasets/utils/warping.py:26-73``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SPMD dispatch (see spmd.py: pallas_call is unpartitionable — callers
# wrap it in shard_map over the data axis when the trace is multi-device)
from dvd_tpu.ops.pallas.spmd import (  # noqa: F401  (re-exported)
    ambient_mesh,
    batch_shards,
    shard_batch0,
)

LANE = 128
BAND = 8          # output rows per grid step (f32 sublane tile)


def _gather_kernel(gx_ref, gy_ref, img_ref, out_ref, *, h, w, q,
                   padding_mode):
    """One (BAND, Q) output band of one (H, W) image plane."""
    zeros = padding_mode == "zeros"

    for jt in range(q // LANE):
        gx = gx_ref[0, :, jt * LANE:(jt + 1) * LANE]      # (BAND, 128) f32
        gy = gy_ref[0, :, jt * LANE:(jt + 1) * LANE]
        x0f = jnp.floor(gx)
        y0f = jnp.floor(gy)
        tx = gx - x0f
        ty = gy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        # per-corner validity (zeros mode) and clipped coordinates
        xc = [jnp.clip(x0, 0, w - 1), jnp.clip(x0 + 1, 0, w - 1)]
        yc = [jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)]
        wx = [1.0 - tx, tx]
        wy = [1.0 - ty, ty]
        if zeros:
            vx = [(x0 >= 0) & (x0 < w), (x0 + 1 >= 0) & (x0 + 1 < w)]
            vy = [(y0 >= 0) & (y0 < h), (y0 + 1 >= 0) & (y0 + 1 < h)]
            wx = [wx[i] * vx[i] for i in (0, 1)]
            wy = [wy[i] * vy[i] for i in (0, 1)]

        # dynamic bounding box over the clipped coords -> strip loop bounds
        ys0 = jnp.min(yc[0]) // BAND
        ys1 = jnp.max(yc[1]) // BAND + 1
        xs0 = jnp.min(xc[0]) // LANE
        xs1 = jnp.max(xc[1]) // LANE + 1

        def ybody(ys, acc):
            row_base = ys * BAND

            def xbody(xs, acc):
                blk = img_ref[0, 0, pl.ds(row_base, BAND),
                              pl.ds(xs * LANE, LANE)]        # (8, 128)
                col_base = xs * LANE
                xm = [xc[0] - col_base, xc[1] - col_base]
                xin = [(m >= 0) & (m < LANE) for m in xm]
                xmc = [jnp.clip(m, 0, LANE - 1) for m in xm]
                for r in range(BAND):
                    row8 = jnp.broadcast_to(blk[r:r + 1, :], (BAND, LANE))
                    g = [jnp.take_along_axis(row8, xmc[i], axis=1)
                         for i in (0, 1)]
                    for dy in (0, 1):
                        hit_y = (yc[dy] == row_base + r)
                        for dx in (0, 1):
                            m = (hit_y & xin[dx]).astype(jnp.float32)
                            acc = acc + g[dx] * (wy[dy] * wx[dx] * m)
                return acc

            return jax.lax.fori_loop(xs0, xs1, xbody, acc)

        acc = jax.lax.fori_loop(
            ys0, ys1, ybody, jnp.zeros((BAND, LANE), jnp.float32))
        out_ref[0, 0, :, jt * LANE:(jt + 1) * LANE] = acc


@functools.partial(jax.jit, static_argnames=("padding_mode", "interpret"))
def gather_bilinear_planar(
    img: jnp.ndarray,     # (N, C, H, W) float32
    gx: jnp.ndarray,      # (N, P, Q) unnormalized x pixel coords
    gy: jnp.ndarray,      # (N, P, Q) unnormalized y pixel coords
    *,
    padding_mode: str = "zeros",
    interpret: bool = False,
) -> jnp.ndarray:         # (N, C, P, Q) float32
    n, c, h, w = img.shape
    _, p, q = gx.shape
    if p % BAND or q % LANE or h % BAND or w % LANE:
        raise ValueError(f"shapes must tile: out=({p},{q}) img=({h},{w})")
    if padding_mode not in ("zeros", "border"):
        raise NotImplementedError(padding_mode)

    kernel = functools.partial(
        _gather_kernel, h=h, w=w, q=q, padding_mode=padding_mode)
    grid = (n, c, p // BAND)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BAND, q), lambda ni, ci, bi: (ni, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BAND, q), lambda ni, ci, bi: (ni, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w), lambda ni, ci, bi: (ni, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BAND, q), lambda ni, ci, bi: (ni, ci, bi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, p, q), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(gx, gy, img)


def _gather_grad_kernel(gx_ref, gy_ref, img_ref, ct_ref, ggx_ref, ggy_ref,
                        *, c, h, w, q, padding_mode):
    """Gradient w.r.t. the *unnormalized* sample coordinates for one
    (BAND, Q) output band, summed over the C channels.

    Same strip-mined structure as :func:`_gather_kernel`, but instead of
    accumulating ``w * I`` it accumulates the two weight-derivative
    contractions::

        d out_c / d gx = sum_{dy,dx} wy[dy] * dwx[dx] * I_c[corner]
        d out_c / d gy = sum_{dy,dx} dwy[dy] * wx[dx] * I_c[corner]

    with ``dwx = [-vx0, +vx1]`` (validity-masked in zeros mode — exactly
    what autodiff of the jnp formulation yields, since the corner masks
    are constants w.r.t. the coords), then dots each with the cotangent
    ``ct_c``.  The whole (C, H, W) image block rides in VMEM and the C
    loop runs inside the kernel, so coordinate decomposition and masks
    are computed once per tile, not once per channel.
    """
    zeros = padding_mode == "zeros"

    for jt in range(q // LANE):
        gx = gx_ref[0, :, jt * LANE:(jt + 1) * LANE]      # (BAND, 128) f32
        gy = gy_ref[0, :, jt * LANE:(jt + 1) * LANE]
        x0f = jnp.floor(gx)
        y0f = jnp.floor(gy)
        tx = gx - x0f
        ty = gy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        xc = [jnp.clip(x0, 0, w - 1), jnp.clip(x0 + 1, 0, w - 1)]
        yc = [jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)]
        wx = [1.0 - tx, tx]
        wy = [1.0 - ty, ty]
        one = jnp.ones_like(tx)
        if zeros:
            vx = [((x0 >= 0) & (x0 < w)).astype(jnp.float32),
                  ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(jnp.float32)]
            vy = [((y0 >= 0) & (y0 < h)).astype(jnp.float32),
                  ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(jnp.float32)]
            wx = [wx[i] * vx[i] for i in (0, 1)]
            wy = [wy[i] * vy[i] for i in (0, 1)]
            dwx = [-vx[0], vx[1]]
            dwy = [-vy[0], vy[1]]
        else:
            dwx = [-one, one]
            dwy = [-one, one]

        ys0 = jnp.min(yc[0]) // BAND
        ys1 = jnp.max(yc[1]) // BAND + 1
        xs0 = jnp.min(xc[0]) // LANE
        xs1 = jnp.max(xc[1]) // LANE + 1

        accx = jnp.zeros((BAND, LANE), jnp.float32)
        accy = jnp.zeros((BAND, LANE), jnp.float32)
        for ci in range(c):
            ct = ct_ref[0, ci, :, jt * LANE:(jt + 1) * LANE]

            def ybody(ys, acc):
                row_base = ys * BAND

                def xbody(xs, acc):
                    ax, ay = acc
                    blk = img_ref[0, ci, pl.ds(row_base, BAND),
                                  pl.ds(xs * LANE, LANE)]    # (8, 128)
                    col_base = xs * LANE
                    xm = [xc[0] - col_base, xc[1] - col_base]
                    xin = [(m >= 0) & (m < LANE) for m in xm]
                    xmc = [jnp.clip(m, 0, LANE - 1) for m in xm]
                    for r in range(BAND):
                        row8 = jnp.broadcast_to(blk[r:r + 1, :], (BAND, LANE))
                        g = [jnp.take_along_axis(row8, xmc[i], axis=1)
                             for i in (0, 1)]
                        for dy in (0, 1):
                            hit_y = (yc[dy] == row_base + r)
                            for dx in (0, 1):
                                m = (hit_y & xin[dx]).astype(jnp.float32)
                                gm = g[dx] * (ct * m)
                                ax = ax + gm * (wy[dy] * dwx[dx])
                                ay = ay + gm * (dwy[dy] * wx[dx])
                    return (ax, ay)

                return jax.lax.fori_loop(xs0, xs1, xbody, acc)

            accx, accy = jax.lax.fori_loop(ys0, ys1, ybody, (accx, accy))

        ggx_ref[0, :, jt * LANE:(jt + 1) * LANE] = accx
        ggy_ref[0, :, jt * LANE:(jt + 1) * LANE] = accy


@functools.partial(jax.jit, static_argnames=("padding_mode", "interpret"))
def gather_bilinear_grad_planar(
    img: jnp.ndarray,     # (N, C, H, W) float32
    gx: jnp.ndarray,      # (N, P, Q) unnormalized x pixel coords
    gy: jnp.ndarray,      # (N, P, Q) unnormalized y pixel coords
    ct: jnp.ndarray,      # (N, C, P, Q) cotangent of the output
    *,
    padding_mode: str = "zeros",
    interpret: bool = False,
) -> tuple:               # (ggx, ggy) each (N, P, Q) float32
    n, c, h, w = img.shape
    _, p, q = gx.shape
    if p % BAND or q % LANE or h % BAND or w % LANE:
        raise ValueError(f"shapes must tile: out=({p},{q}) img=({h},{w})")
    if padding_mode not in ("zeros", "border"):
        raise NotImplementedError(padding_mode)

    kernel = functools.partial(
        _gather_grad_kernel, c=c, h=h, w=w, q=q, padding_mode=padding_mode)
    grid = (n, p // BAND)
    shp = jax.ShapeDtypeStruct((n, p, q), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BAND, q), lambda ni, bi: (ni, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BAND, q), lambda ni, bi: (ni, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, BAND, q), lambda ni, bi: (ni, 0, bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BAND, q), lambda ni, bi: (ni, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BAND, q), lambda ni, bi: (ni, bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[shp, shp],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(gx, gy, img, ct)


# VMEM budget: the plane plus double-buffered bands must fit.  The
# default 16 MB scoped-vmem limit is not the v5e hardware (128 MB);
# the pallas_call below raises the scoped limit so DIR300-shaped
# (~2000-2400 px) planes take the strip-mined kernel instead of the
# row-chunked XLA gather (271 ms/img at 2048^2 —
# docs/STAGE_PROFILE_hires.json row_chunked rows).
_MAX_PLANE_BYTES = 24 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def supports(img_shape, grid_shape) -> bool:
    """True when the Pallas path can serve this (NHWC img, NPQ2 grid):
    TPU backend, tileable shapes, and an image plane that fits VMEM.
    ``DVD_TPU_DISABLE_PALLAS`` is the kill switch (same as attention)."""
    import os

    if os.environ.get("DVD_TPU_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    n, h, w, c = img_shape
    _, p, q, _ = grid_shape
    return (h % BAND == 0 and w % LANE == 0 and p % BAND == 0
            and q % LANE == 0 and h * w * 4 <= _MAX_PLANE_BYTES)


def supports_grad(img_shape, grid_shape) -> bool:
    """True when :func:`gather_bilinear_grad_planar` can serve this: the
    grad kernel keeps ALL C image planes in VMEM (the C loop runs inside
    the kernel so the coordinate decomposition is shared)."""
    n, h, w, c = img_shape
    return (supports(img_shape, grid_shape)
            and c * h * w * 4 <= _MAX_PLANE_BYTES)


def grid_sample_pallas(
    img: jnp.ndarray,     # (N, H, W, C) any float dtype
    grid: jnp.ndarray,    # (N, P, Q, 2) in [-1, 1], torch convention
    *,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    interpret: bool = False,
) -> jnp.ndarray:
    """NHWC drop-in for :func:`dvd_tpu.ops.grid_sample.grid_sample`
    (bilinear).  Transposes to planar around the kernel."""
    if not align_corners:
        raise NotImplementedError("align_corners=False")
    n, h, w, c = img.shape
    gx = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (h - 1)
    planar = jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2))
    out = gather_bilinear_planar(
        planar, gx, gy, padding_mode=padding_mode, interpret=interpret)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(img.dtype)
