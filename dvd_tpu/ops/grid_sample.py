"""Bilinear grid sampling with exact ``torch.nn.functional.grid_sample``
semantics (``align_corners=True``, ``padding_mode='zeros'`` by default).

This is the single hottest non-matmul op in the framework — the reference
uses it for the output unwarp, the composed warp loss, the time-variant
feature re-warp inside the sampler, and dataset intermediate-warp synthesis
(reference ``datasets/utils/warping.py:26-73``, ``gaussian_diffusion.py:999``).

Implementation notes (TPU):
- The gather formulation below is the fast path: XLA lowers the four
  corner gathers to native dynamic-gathers, and it is fully
  differentiable w.r.t. both image and grid (needed in the loss path).
- For large outputs the four corner gathers would materialize
  output-sized intermediates in HBM (~500 bytes/pixel transient; a
  2048^2 RGB batch of 8 peaked at ~2 GB and OOMed a 16 GB chip).  Pass
  ``row_chunk`` (or use the auto threshold in :func:`warp_big`) to tile
  the computation over output-row chunks with an internal ``lax.scan`` —
  intermediates are bounded by the chunk size, the result matches the
  unchunked path to within one ulp (XLA fusion/FMA reordering), and it
  stays differentiable.
- A strip-mined Pallas kernel (``dvd_tpu.ops.pallas.grid_sample``)
  serves the inference unwarp (forward-only, 4.3x XLA's gather on v5e)
  and — via :func:`warp_const_src` below — the composed-warp loss
  (forward + grad-w.r.t.-grid kernels; the source is loss data, so no
  image cotangent/scatter is needed).  This differentiable jnp gather
  formulation remains the general path: fully differentiable w.r.t.
  both inputs, any backend, any shape.

Layout: images are NHWC, grids are ``(N, Ho, Wo, 2)`` with
``grid[..., 0] = x`` in [-1, 1] (torch convention).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _corners(gx, gy, mode: str):
    if mode == "nearest":
        xi = jnp.round(gx).astype(jnp.int32)
        yi = jnp.round(gy).astype(jnp.int32)
        return [(yi, xi, None)]
    if mode == "bilinear":
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        tx = (gx - x0)[..., None]
        ty = (gy - y0)[..., None]
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        return [
            (y0, x0, (1 - ty) * (1 - tx)),
            (y0, x0 + 1, (1 - ty) * tx),
            (y0 + 1, x0, ty * (1 - tx)),
            (y0 + 1, x0 + 1, ty * tx),
        ]
    raise NotImplementedError(mode)


def _sample(img_flat, batch_off, h, w, gx, gy, mode, padding_mode,
            compute_dtype):
    """Gather + weight the corners for coords (n, ho, wo)."""
    n, ho, wo = gx.shape
    c = img_flat.shape[-1]
    out = jnp.zeros((n, ho, wo, c), dtype=compute_dtype)
    for yi, xi, wgt in _corners(gx, gy, mode):
        if padding_mode == "zeros":
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            mask = valid[..., None].astype(compute_dtype)
        elif padding_mode == "border":
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            mask = None
        else:
            raise NotImplementedError(padding_mode)
        idx = batch_off + yc * w + xc
        vals = jnp.take(img_flat, idx.reshape(-1), axis=0)
        vals = vals.reshape(n, ho, wo, c)
        if mask is not None:
            vals = vals * mask
        if wgt is not None:
            vals = vals * wgt.astype(compute_dtype)
        out = out + vals
    return out


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    *,
    align_corners: bool = True,
    padding_mode: str = "zeros",
    mode: str = "bilinear",
    row_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Sample ``img`` (N, H, W, C) at ``grid`` (N, Ho, Wo, 2) -> (N, Ho, Wo, C).

    Matches torch ``F.grid_sample`` for ``mode in {bilinear, nearest}`` and
    ``padding_mode in {zeros, border}``.  ``row_chunk`` tiles the output
    rows through an internal scan to bound HBM intermediates (identical
    values; use for large outputs).
    """
    if img.ndim != 4 or grid.ndim != 4 or grid.shape[-1] != 2:
        raise ValueError(f"bad shapes img={img.shape} grid={grid.shape}")
    n, h, w, c = img.shape
    gn, ho, wo, _ = grid.shape
    if gn != n:
        raise ValueError(f"batch mismatch {n} vs {gn}")

    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    gx = _unnormalize(grid[..., 0].astype(compute_dtype), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(compute_dtype), h, align_corners)

    img_flat = img.reshape(n * h * w, c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]

    if row_chunk and 0 < row_chunk < ho:
        if ho % row_chunk:
            # shrink to the nearest divisor rather than silently falling
            # back to the unchunked (OOM-prone) full-size gather
            while ho % row_chunk:
                row_chunk -= 1
        k = ho // row_chunk
        # (k, n, row_chunk, wo) chunk-major so lax.map runs over chunks
        cgx = gx.reshape(n, k, row_chunk, wo).transpose(1, 0, 2, 3)
        cgy = gy.reshape(n, k, row_chunk, wo).transpose(1, 0, 2, 3)
        out = jax.lax.map(
            lambda ab: _sample(img_flat, batch_off, h, w, ab[0], ab[1],
                               mode, padding_mode, compute_dtype),
            (cgx, cgy),
        )                                        # (k, n, row_chunk, wo, c)
        out = out.transpose(1, 0, 2, 3, 4).reshape(n, ho, wo, c)
    else:
        out = _sample(img_flat, batch_off, h, w, gx, gy, mode, padding_mode,
                      compute_dtype)
    return out.astype(img.dtype)


def warp(img: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Reference ``register_model2([img, grid])`` equivalent
    (``warping.py:14-73``): grid already in [-1, 1], align_corners=True,
    zero padding."""
    return grid_sample(img, grid, align_corners=True, padding_mode="zeros", mode=mode)


def _make_warp_const_src_pallas(interpret: bool):
    @jax.custom_vjp
    def f(img, grid):
        from dvd_tpu.ops.pallas import grid_sample as pgs

        return pgs.grid_sample_pallas(
            img, grid, padding_mode="zeros", interpret=interpret)

    def fwd(img, grid):
        return f(img, grid), (img, grid)

    def bwd(res, ct):
        from dvd_tpu.ops.pallas import grid_sample as pgs

        img, grid = res
        n, h, w, c = img.shape
        sx = 0.5 * (w - 1)
        sy = 0.5 * (h - 1)
        gx = (grid[..., 0].astype(jnp.float32) + 1.0) * sx
        gy = (grid[..., 1].astype(jnp.float32) + 1.0) * sy
        planar = jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2))
        ctp = jnp.transpose(ct.astype(jnp.float32), (0, 3, 1, 2))
        ggx, ggy = pgs.gather_bilinear_grad_planar(
            planar, gx, gy, ctp, padding_mode="zeros", interpret=interpret)
        # chain through the align_corners unnormalization gx = (x+1)*sx
        gg = jnp.stack([ggx * sx, ggy * sy], axis=-1)
        return (jnp.zeros_like(img), gg.astype(grid.dtype))

    f.defvjp(fwd, bwd)
    return f


_warp_const_src_pallas = _make_warp_const_src_pallas(False)
_warp_const_src_pallas_interpret = _make_warp_const_src_pallas(True)


def warp_const_src(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """:func:`warp` with the source image treated as constant data: the
    VJP returns a zero cotangent for ``img`` and an exact torch-parity
    gradient w.r.t. ``grid``.

    This is the composed-warp loss case (``gaussian_diffusion.py:999``:
    ``f_new = warp(f_inter, f_pred)`` — ``f_inter`` is ground truth, only
    ``f_pred`` carries gradient).  On TPU at tileable shapes both the
    forward and the grid-gradient run as strip-mined Pallas kernels
    (XLA's gather/arithmetic formulation costs ~60 ms/step of the
    production train step at batch 8, ``docs/TRAIN_PROFILE.json``);
    elsewhere it falls back to the jnp path with ``stop_gradient`` on the
    source, which is semantically identical.
    """
    from dvd_tpu.ops.pallas import grid_sample as pgs

    if pgs.supports_grad(img.shape, grid.shape):   # implies supports()
        mesh = pgs.ambient_mesh()
        if mesh is None:
            return _warp_const_src_pallas(img, grid)
        # multi-device trace (the train step under `with mesh:`):
        # pallas_call has no SPMD partitioning rule, so run it per
        # data-shard via shard_map (the kernel is batch-pointwise)
        if img.shape[0] % pgs.batch_shards(mesh) == 0:
            return pgs.shard_batch0(
                _warp_const_src_pallas, mesh, n_in=2)(img, grid)
    return warp(jax.lax.stop_gradient(img), grid)


# transient bytes per output pixel of the unchunked gather formulation
# (4 corner value/mask/weight intermediates + index arrays, measured on
# v5e HLO allocations)
_BYTES_PER_PIXEL = 500
_HBM_BUDGET = int(1.5e9)


def auto_row_chunk(n: int, ho: int, wo: int, c: int) -> Optional[int]:
    """Pick a row_chunk so gather transients stay under ~1.5 GB."""
    per_row = n * wo * max(c, 2) * _BYTES_PER_PIXEL // 3
    max_rows = max(1, _HBM_BUDGET // max(per_row, 1))
    if max_rows >= ho:
        return None
    chunk = max(1, max_rows)
    while ho % chunk:          # scan needs an even split
        chunk -= 1
    return chunk


def warp_big(img: jnp.ndarray, grid: jnp.ndarray,
             padding_mode: str = "zeros") -> jnp.ndarray:
    """Like :func:`grid_sample` with an automatic row chunk for large
    outputs (the native-canvas unwarp path)."""
    n, ho, wo, _ = grid.shape
    return grid_sample(
        img, grid, align_corners=True, padding_mode=padding_mode,
        row_chunk=auto_row_chunk(n, ho, wo, img.shape[-1]))
