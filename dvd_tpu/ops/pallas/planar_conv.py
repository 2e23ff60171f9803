"""Pallas TPU conv kernel in planar layout for the small-channel aux nets.

Why this exists (round 5): the conditioning aux nets (U2NetP x2,
text-line UNet, DiT conditioning pyramid) are 3x3-conv stacks whose
intermediate tensors have 4..64 channels at 288^2..512^2.  In NHWC the
channel axis is the TPU lane dimension, so XLA pads every HBM
materialization 16 -> 128 lanes (8x useless traffic for U2NetP's 16-ch
tensors, 32x for the pyramid's 4-ch input) and feeds the MXU 16-wide
contractions (12.5% lane utilization).  Measured consequence
(docs/COND_PROFILE.json): the whole conditioning stage is "HBM-bound" at
6-30% of FLOPs peak while moving gigabytes per image that the math does
not require.

This kernel stores activations *planar*: ``(B, C, P)`` with ``P = H*W``
flattened into the lane dimension (padded to a multiple of 128 once,
<0.2% waste) and ``C`` in sublanes (multiples of 16 for bf16 -> zero
padding for every channel width these nets use).  A 3x3 (optionally
dilated) conv then becomes, per output tile, nine lane-shifted reads of
an HBM-DMA'd slab plus MXU contractions with the taps stacked into the
K dimension (K = group*Cin up to 128), with column/row validity masks
computed from a precomputed row/col index plane (flat shifts wrap across
row boundaries; the masks restore exact 'SAME' zero-padding semantics).
BatchNorm (frozen) + conv bias + ReLU are fused into the f32 epilogue.

The kernel is exact conv math (f32 accumulation — slightly *more*
precise than the NHWC path, which rounds the conv output to bf16 before
the BN): parity vs the flax modules is asserted in
tests/test_planar_aux.py at f32 (1e-5) and bf16 (1e-2) tolerances.

Reference architectures being served: U2NetP (``geotr_core.py:24-332``),
text-line UNet (``geotr/unet_model.py``), ConditioningPyramid
(``cross_model.py:18-95``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_CK = 128                 # Cin chunk (K rows per DMA'd slab)
# Mosaic's stack allocator keeps more intermediates live than the naive
# slab+xs+acc+out sum (measured ~2-3x), so the tile budget is
# conservative and the scoped-vmem ceiling is raised (v5e has 128 MB
# physical VMEM; the 16 MB default scoped limit is not the hardware).
_VMEM_BUDGET = 6 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_p(h: int, w: int) -> int:
    """Padded flat spatial length for an (h, w) plane."""
    return round_up(h * w, LANE)


@functools.lru_cache(maxsize=64)
def _rowcol_np(h: int, w: int) -> np.ndarray:
    """(2, Pp) int32 [row; col] per flat position; pad tail gets row=h
    (masks every tap off, so pad lanes compute act(bias) — finite and
    ignored by every consumer)."""
    pp = pad_p(h, w)
    r = np.full((pp,), h, np.int32)
    c = np.zeros((pp,), np.int32)
    idx = np.arange(h * w)
    r[: h * w] = idx // w
    c[: h * w] = idx % w
    return np.stack([r, c])


def _pick_tile(pp: int, cc: int, cout: int, halo_pad: int) -> int:
    """Largest 128-multiple tile dividing pp under the VMEM budget."""
    gcc = min(9 * cc, _CK)

    def bytes_at(t):
        return (cc * (t + 2 * halo_pad) * 2      # slab (bf16)
                + gcc * t * 2                    # xs (bf16)
                + cout * t * 4                   # acc (f32)
                + cout * t * 2)                  # out block

    if bytes_at(pp) <= _VMEM_BUDGET:
        return pp
    best = None
    for n_tiles in range(2, pp // LANE + 1):
        if pp % (n_tiles * LANE):
            continue
        t = pp // n_tiles
        if bytes_at(t) <= _VMEM_BUDGET:
            best = t
            break
    if best is None:
        raise ValueError(f"no tile fits VMEM: pp={pp} cc={cc} cout={cout}")
    return best


def _conv_kernel(rc_ref, wmat_ref, sb_ref, x_ref, out_ref, slab, xs, sem,
                 *, h, w, pp, tile, halo_pad, chunks, groups, taps, act,
                 out_dtype):
    """One (Cout, TILE) output tile of one batch image.

    chunks: tuple of (ic0, cc, k0) — Cin chunk start, width, and the
    chunk's row offset into wmat's K axis.
    groups: tuple of tap-index tuples; taps stacked into K per group.
    taps:   tuple of (dy, dx) pixel offsets (dilation pre-multiplied).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    # tile and halo_pad are 128-multiples; the hint lets Mosaic prove the
    # HBM slice offsets are lane-tile aligned
    base = pl.multiple_of(t * tile, 128)

    row = rc_ref[0:1, :]                      # (1, TILE) int32
    col = rc_ref[1:2, :]
    masks = []
    maskf = []
    for (dy, dx) in taps:
        m = ((row + dy >= 0) & (row + dy < h)
             & (col + dx >= 0) & (col + dx < w))
        masks.append(m.astype(jnp.bfloat16))
        maskf.append(m.astype(jnp.float32))

    slab_len = tile + 2 * halo_pad
    first = True
    acc = None
    for (ic0, cc, k0) in chunks:
        # ---- DMA the halo'd slab for this Cin chunk -------------------
        if n_t == 1:
            cp = pltpu.make_async_copy(
                x_ref.at[b, pl.ds(ic0, cc), :],
                slab.at[0:cc, pl.ds(halo_pad, pp)], sem)
            cp.start()
            slab[0:cc, 0:halo_pad] = jnp.zeros((cc, halo_pad), slab.dtype)
            slab[0:cc, pl.ds(halo_pad + pp, slab_len - halo_pad - pp)] = \
                jnp.zeros((cc, slab_len - halo_pad - pp), slab.dtype)
            cp.wait()
        else:
            # three static copy shapes; edge tiles zero their halo
            @pl.when(t == 0)
            def _():
                cp = pltpu.make_async_copy(
                    x_ref.at[b, pl.ds(ic0, cc), pl.ds(0, tile + halo_pad)],
                    slab.at[0:cc, pl.ds(halo_pad, tile + halo_pad)], sem)
                cp.start()
                slab[0:cc, 0:halo_pad] = jnp.zeros((cc, halo_pad),
                                                   slab.dtype)
                cp.wait()

            @pl.when(t == n_t - 1)
            def _():
                cp = pltpu.make_async_copy(
                    x_ref.at[b, pl.ds(ic0, cc),
                             pl.ds(pl.multiple_of(base - halo_pad, 128),
                                   tile + halo_pad)],
                    slab.at[0:cc, pl.ds(0, tile + halo_pad)], sem)
                cp.start()
                slab[0:cc, pl.ds(tile + halo_pad, halo_pad)] = \
                    jnp.zeros((cc, halo_pad), slab.dtype)
                cp.wait()

            @pl.when((t != 0) & (t != n_t - 1))
            def _():
                cp = pltpu.make_async_copy(
                    x_ref.at[b, pl.ds(ic0, cc),
                             pl.ds(pl.multiple_of(base - halo_pad, 128),
                                   slab_len)],
                    slab.at[0:cc, :], sem)
                cp.start()
                cp.wait()

        dn = (((1,), (0,)), ((), ()))
        if cc >= 64:
            # wide channels: K=cc fills the MXU per tap — dot directly on
            # the shifted slab slice, mask the (Cout, TILE) result (no xs
            # copies, less VMEM)
            for ti, (dy, dx) in enumerate(taps):
                off = halo_pad + dy * w + dx
                wg = wmat_ref[:, pl.ds(k0 + ti * cc, cc)]
                d = jax.lax.dot_general(
                    wg, slab[0:cc, pl.ds(off, tile)], dn,
                    preferred_element_type=jnp.float32) * maskf[ti]
                acc = d if first else acc + d
                first = False
            continue
        # ---- narrow channels: stack masked shifted slices into K ------
        for grp in groups:
            kg = len(grp) * cc
            for j, ti in enumerate(grp):
                dy, dx = taps[ti]
                off = halo_pad + dy * w + dx
                xs[pl.ds(j * cc, cc), :] = (
                    slab[0:cc, pl.ds(off, tile)] * masks[ti])
            # wmat rows for this (chunk, group): laid out contiguously as
            # [chunk: [tap: [ci]]] by the wrapper
            g0 = k0 + grp[0] * cc
            wg = wmat_ref[:, pl.ds(g0, kg)]
            d = jax.lax.dot_general(
                wg, xs[pl.ds(0, kg), :], dn,
                preferred_element_type=jnp.float32)
            if first:
                acc = d
                first = False
            else:
                acc = acc + d

    scale = sb_ref[:, 0:1]                    # (Cout, 1) f32
    bias = sb_ref[:, 1:2]
    y = acc * scale + bias
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[0, :, :] = y.astype(out_dtype)


def _conv3x3_planar_xla(x, w, scale, bias, *, hw, dilation, act, out_dtype):
    """Reference/fallback path: same planar contract via lax.conv with
    f32 accumulation like the kernel.  Used off-TPU, by the parity
    tests, and (on TPU) for planes below ``_MIN_PP`` — small planes are
    dispatch-overhead-bound, where XLA's fused convs beat a pallas_call
    per conv; the lane-padding tax this kernel exists to remove only
    matters at the big planes."""
    b, cin, pp = x.shape
    h, wd = hw
    d = dilation
    x4 = x[:, :, : h * wd].reshape(b, cin, h, wd)
    y = jax.lax.conv_general_dilated(
        x4, w.astype(x.dtype), (1, 1), [(d, d), (d, d)],
        rhs_dilation=(d, d),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32)
    y = y * scale[None, :, None, None] + bias[None, :, None, None]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    y = y.reshape(b, -1, h * wd).astype(out_dtype)
    if pp != h * wd:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pp - h * wd)))
    return y


def conv3x3_planar(
    x: jnp.ndarray,          # (B, Cin, Pp) bf16/f32; pad lanes finite
    w: jnp.ndarray,          # (3, 3, Cin, Cout) — flax HWIO kernel
    scale: jnp.ndarray,      # (Cout,) f32 fused affine (BN folded)
    bias: jnp.ndarray,       # (Cout,) f32
    *,
    hw: Tuple[int, int],
    dilation: int = 1,
    act: Optional[str] = "relu",
    out_dtype=None,
    interpret: bool = False,
    tile_override: Optional[int] = None,   # tests: force multi-tile paths
) -> jnp.ndarray:            # (B, Cout, Pp)
    """Planar 'SAME'-padded 3x3 conv with fused affine+activation.

    Dispatch: the Pallas kernel on TPU (or when ``interpret=True`` for
    kernel tests); the XLA NCHW fallback elsewhere and for planes below
    ``_min_pp()`` — identical contract, so the planar model code runs
    everywhere."""
    out_dtype = out_dtype or x.dtype
    if not interpret and (not supports() or x.shape[-1] < _min_pp()):
        return _conv3x3_planar_xla(x, w, scale, bias, hw=hw,
                                   dilation=dilation, act=act,
                                   out_dtype=out_dtype)
    b, cin, pp = x.shape
    h, wd = hw
    assert pp == pad_p(h, wd), (pp, h, wd)
    kh, kw, wci, cout = w.shape
    assert (kh, kw, wci) == (3, 3, cin), (w.shape, cin)
    out_dtype = out_dtype or x.dtype
    if cin % 8:
        # Mosaic requires DMA slice extents aligned to the sublane tile;
        # zero-pad the channel dim (only image-entry convs: cin 3/4)
        pad = 8 - cin % 8
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
        cin += pad

    d = dilation
    taps = tuple((dy * d, dx * d) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    halo = d * wd + d
    halo_pad = round_up(halo, LANE)

    chunks = []
    k0 = 0
    for ic0 in range(0, cin, _CK):
        cc = min(_CK, cin - ic0)
        chunks.append((ic0, cc, k0))
        k0 += 9 * cc
    cc0 = chunks[0][1]
    g = max(1, min(9, _CK // cc0))
    groups = tuple(tuple(range(i, min(i + g, 9))) for i in range(0, 9, g))

    tile = tile_override or _pick_tile(pp, cc0, cout, halo_pad)
    if pp // tile > 1 and (tile + halo_pad > pp or tile < halo_pad):
        # the 3-case DMA assumes halo_pad <= tile and tile+halo <= pp
        tile = pp

    # wmat (Cout, sum_c 9*cc): [chunk [tap [ci]]] row order, matching xs
    wm = jnp.transpose(w, (3, 0, 1, 2)).reshape(cout, 9, cin)
    parts = [wm[:, :, ic0:ic0 + cc].reshape(cout, 9 * cc)
             for (ic0, cc, _) in chunks]
    wmat = jnp.concatenate(parts, axis=1).astype(jnp.bfloat16) \
        if x.dtype == jnp.bfloat16 else jnp.concatenate(parts, axis=1)
    sb = jnp.stack([scale.astype(jnp.float32),
                    bias.astype(jnp.float32)], axis=1)   # (Cout, 2)

    rc = jnp.asarray(_rowcol_np(h, wd))
    n_t = pp // tile
    gcc = max(len(grp) for grp in groups) * cc0
    kernel = functools.partial(
        _conv_kernel, h=h, w=wd, pp=pp, tile=tile, halo_pad=halo_pad,
        chunks=tuple(chunks), groups=groups, taps=taps, act=act,
        out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((2, tile), lambda bi, ti: (0, ti),
                         memory_space=pltpu.VMEM),             # rc
            pl.BlockSpec(wmat.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),             # wmat
            pl.BlockSpec(sb.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),             # scale/bias
            pl.BlockSpec(memory_space=pl.ANY),                 # x (DMA'd)
        ],
        out_specs=pl.BlockSpec((1, cout, tile),
                               lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, pp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((cc0, tile + 2 * halo_pad), x.dtype),   # slab
            pltpu.VMEM((gcc, tile), x.dtype),                  # xs
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rc, wmat, sb, x)


def conv1x1_planar(x, w, scale, bias, *, act=None, out_dtype=None):
    """1x1 conv on planar tensors — a plain XLA dot (lanes already P,
    sublanes C: no padding, MXU-friendly)."""
    out_dtype = out_dtype or x.dtype
    wm = w.reshape(w.shape[-2], w.shape[-1])          # (Cin, Cout)
    y = jnp.einsum("io,bip->bop", wm.astype(jnp.float32),
                   x.astype(jnp.float32))
    y = y * scale[None, :, None] + bias[None, :, None]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "sigmoid":
        y = jax.nn.sigmoid(y)
    return y.astype(out_dtype)


def _min_pp() -> int:
    """Planes smaller than this run the XLA fallback (overhead-bound
    regime).  Env-tunable for A/B: DVD_TPU_PLANAR_MIN_PP."""
    import os

    try:
        return int(os.environ.get("DVD_TPU_PLANAR_MIN_PP", "0"))
    except ValueError:
        return 0


def supports() -> bool:
    """Kill switch + backend gate (same convention as the other kernels)."""
    import os

    if os.environ.get("DVD_TPU_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"
