"""Planar-layout forward passes for the frozen aux nets (TPU serving).

Same math, same parameter trees as the NHWC flax modules in
``models/u2net.py`` / ``models/textline_unet.py`` / the DiT
``ConditioningPyramid`` — but activations flow as ``(B, C, P)`` planar
tensors through the Pallas conv kernel (``ops/pallas/planar_conv.py``),
which removes the NHWC small-channel lane-padding HBM tax and the
16-wide MXU contractions.  See that module's docstring for the layout
rationale and measured motivation.

Every function here takes the *flax variables dict* of the corresponding
module, so checkpoints and the torch converter are untouched; parity vs
the NHWC ``Module.apply`` is asserted in ``tests/test_planar_aux.py``.

Interstitial ops (ceil max-pool, separable bilinear resize, concat,
residual adds, sigmoid) run in XLA directly on planar tensors: with P in
lanes and C in sublanes none of them pad, and the resizes reuse the
exact ``ops/resize`` weight construction (torch parity).

Reference architectures: U2NetP ``geotr_core.py:24-332``, Seg wrapper
``:984-995``, GeoTrSegInf mask branch ``:997-1019`` (its GeoTr transformer
output is dead in the production config — ``use_init_flow=False`` — and
XLA DCE's it from the NHWC path too), text-line UNet
``geotr/unet_model.py``, ConditioningPyramid ``cross_model.py:18-95``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvd_tpu.ops.pallas.planar_conv import (conv1x1_planar, conv3x3_planar,
                                            pad_p)
from dvd_tpu.ops.resize import _linear_weights

BN_EPS = 1e-5


# ------------------------------------------------------------ layout glue
def to_planar(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, Pp) with zero pad lanes."""
    b, h, w, c = x.shape
    pp = pad_p(h, w)
    flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * w)
    if pp != h * w:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pp - h * w)))
    return flat


def from_planar(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, C, Pp) -> (B, H, W, C)."""
    b, c, _ = x.shape
    h, w = hw
    return jnp.transpose(x[:, :, : h * w].reshape(b, c, h, w), (0, 2, 3, 1))


def _view4(x: jnp.ndarray, hw) -> jnp.ndarray:
    b, c, _ = x.shape
    return x[:, :, : hw[0] * hw[1]].reshape(b, c, *hw)


def _flat(x4: jnp.ndarray) -> jnp.ndarray:
    b, c, h, w = x4.shape
    flat = x4.reshape(b, c, h * w)
    pp = pad_p(h, w)
    if pp != h * w:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pp - h * w)))
    return flat


def pool2_planar(x: jnp.ndarray, hw) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """2x2/2 max pool, ceil mode (odd edges padded with -inf)."""
    h, w = hw
    x4 = _view4(x, hw)
    ph, pw = h % 2, w % 2
    if ph or pw:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, ph), (0, pw)),
                     constant_values=-jnp.inf)
    y = jax.lax.reduce_window(
        x4, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return _flat(y), ((h + 1) // 2, (w + 1) // 2)


def resize_planar(x: jnp.ndarray, hw, out_hw,
                  align_corners: bool) -> jnp.ndarray:
    """Separable bilinear resize on planar tensors (same weights as
    ``ops/resize.resize_bilinear`` -> torch parity)."""
    if tuple(hw) == tuple(out_hw):
        return x
    x4 = _view4(x, hw)
    a = jnp.asarray(_linear_weights(hw[0], out_hw[0], align_corners),
                    x.dtype)
    bw = jnp.asarray(_linear_weights(hw[1], out_hw[1], align_corners),
                     x.dtype)
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bchw->bcow", a, x4, precision=hp)
    y = jnp.einsum("pw,bcow->bcop", bw, y, precision=hp)
    return _flat(y)


# --------------------------------------------------------------- conv ops
def _fused_affine(conv_p: Dict, bn_p: Dict, bn_s: Dict):
    """Fold conv bias + frozen BN into (scale, bias) f32."""
    inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + BN_EPS) \
        * bn_p["scale"].astype(jnp.float32)
    b = (conv_p["bias"].astype(jnp.float32)
         - bn_s["mean"].astype(jnp.float32)) * inv \
        + bn_p["bias"].astype(jnp.float32)
    return inv, b


def rebnconv(p: Dict, s: Dict, x: jnp.ndarray, hw, dirate: int = 1,
             interpret: bool = False) -> jnp.ndarray:
    """REBNCONV: 3x3 dilated conv + frozen BN + ReLU, fused."""
    scale, bias = _fused_affine(p["conv_s1"], p["bn_s1"], s["bn_s1"])
    return conv3x3_planar(x, p["conv_s1"]["kernel"], scale, bias,
                          hw=hw, dilation=dirate, act="relu",
                          interpret=interpret)


def _plain_conv3(p: Dict, x, hw, act, interpret=False):
    """3x3 conv + bias (+ optional act), no BN (pyramid / side convs)."""
    cout = p["kernel"].shape[-1]
    return conv3x3_planar(
        x, p["kernel"], jnp.ones((cout,), jnp.float32),
        p["bias"].astype(jnp.float32), hw=hw, act=act, interpret=interpret)


# -------------------------------------------------------------- U2NetP
def _rsu(p: Dict, s: Dict, x, hw, height: int, interpret=False):
    """RSU-L block (u2net.py:62-92)."""
    hxin = rebnconv(p["rebnconvin"], s["rebnconvin"], x, hw, 1, interpret)
    enc = [rebnconv(p["rebnconv1"], s["rebnconv1"], hxin, hw, 1, interpret)]
    sizes = [hw]
    h, cur = enc[0], hw
    for i in range(2, height):
        h, cur = pool2_planar(h, cur)
        h = rebnconv(p[f"rebnconv{i}"], s[f"rebnconv{i}"], h, cur, 1,
                     interpret)
        enc.append(h)
        sizes.append(cur)
    top = rebnconv(p[f"rebnconv{height}"], s[f"rebnconv{height}"],
                   enc[-1], sizes[-1], 2, interpret)

    d = top
    for i in range(height - 1, 0, -1):
        cat = jnp.concatenate([d, enc[i - 1]], axis=1)
        d = rebnconv(p[f"rebnconv{i}d"], s[f"rebnconv{i}d"], cat,
                     sizes[i - 1], 1, interpret)
        if i > 1:
            d = resize_planar(d, sizes[i - 1], sizes[i - 2],
                              align_corners=False)
    return d + hxin


def _rsu4f(p: Dict, s: Dict, x, hw, interpret=False):
    """Dilation-only RSU (u2net.py:95-115)."""
    hxin = rebnconv(p["rebnconvin"], s["rebnconvin"], x, hw, 1, interpret)
    h1 = rebnconv(p["rebnconv1"], s["rebnconv1"], hxin, hw, 1, interpret)
    h2 = rebnconv(p["rebnconv2"], s["rebnconv2"], h1, hw, 2, interpret)
    h3 = rebnconv(p["rebnconv3"], s["rebnconv3"], h2, hw, 4, interpret)
    h4 = rebnconv(p["rebnconv4"], s["rebnconv4"], h3, hw, 8, interpret)
    d3 = rebnconv(p["rebnconv3d"], s["rebnconv3d"],
                  jnp.concatenate([h4, h3], 1), hw, 4, interpret)
    d2 = rebnconv(p["rebnconv2d"], s["rebnconv2d"],
                  jnp.concatenate([d3, h2], 1), hw, 2, interpret)
    d1 = rebnconv(p["rebnconv1d"], s["rebnconv1d"],
                  jnp.concatenate([d2, h1], 1), hw, 1, interpret)
    return d1 + hxin


def u2netp_planar(variables: Dict, x: jnp.ndarray, hw,
                  interpret: bool = False):
    """U2NetP forward, planar (u2net.py:118-160).  ``x``: (B, 3, Pp).

    Returns (sigmoid(d0), s6, d5, d4, d3, d2, d1) planar + their sizes:
    ((tensor, hw), ...) so consumers can resize without re-deriving the
    ceil-pool chain.
    """
    p, s = variables["params"], variables["batch_stats"]

    s1 = _rsu(p["stage1"], s["stage1"], x, hw, 7, interpret)
    x2, hw2 = pool2_planar(s1, hw)
    s2 = _rsu(p["stage2"], s["stage2"], x2, hw2, 6, interpret)
    x3, hw3 = pool2_planar(s2, hw2)
    s3 = _rsu(p["stage3"], s["stage3"], x3, hw3, 5, interpret)
    x4, hw4 = pool2_planar(s3, hw3)
    s4 = _rsu(p["stage4"], s["stage4"], x4, hw4, 4, interpret)
    x5, hw5 = pool2_planar(s4, hw4)
    s5 = _rsu4f(p["stage5"], s["stage5"], x5, hw5, interpret)
    x6, hw6 = pool2_planar(s5, hw5)
    s6 = _rsu4f(p["stage6"], s["stage6"], x6, hw6, interpret)

    up = lambda t, a, b_: resize_planar(t, a, b_, align_corners=False)
    d5 = _rsu4f(p["stage5d"], s["stage5d"],
                jnp.concatenate([up(s6, hw6, hw5), s5], 1), hw5, interpret)
    d4 = _rsu(p["stage4d"], s["stage4d"],
              jnp.concatenate([up(d5, hw5, hw4), s4], 1), hw4, 4, interpret)
    d3 = _rsu(p["stage3d"], s["stage3d"],
              jnp.concatenate([up(d4, hw4, hw3), s3], 1), hw3, 5, interpret)
    d2 = _rsu(p["stage2d"], s["stage2d"],
              jnp.concatenate([up(d3, hw3, hw2), s2], 1), hw2, 6, interpret)
    d1 = _rsu(p["stage1d"], s["stage1d"],
              jnp.concatenate([up(d2, hw2, hw), s1], 1), hw, 7, interpret)

    o1 = _plain_conv3(p["side1"], d1, hw, None, interpret)
    o2 = up(_plain_conv3(p["side2"], d2, hw2, None, interpret), hw2, hw)
    o3 = up(_plain_conv3(p["side3"], d3, hw3, None, interpret), hw3, hw)
    o4 = up(_plain_conv3(p["side4"], d4, hw4, None, interpret), hw4, hw)
    o5 = up(_plain_conv3(p["side5"], d5, hw5, None, interpret), hw5, hw)
    o6 = up(_plain_conv3(p["side6"], s6, hw6, None, interpret), hw6, hw)
    d0 = conv1x1_planar(
        jnp.concatenate([o1, o2, o3, o4, o5, o6], 1),
        p["outconv"]["kernel"], jnp.ones((1,), jnp.float32),
        p["outconv"]["bias"].astype(jnp.float32), act="sigmoid")
    return ((d0, hw), (s6, hw6), (d5, hw5), (d4, hw4), (d3, hw3),
            (d2, hw2), (d1, hw))


def _sub(variables: Dict, name: str) -> Dict:
    return {"params": variables["params"][name],
            "batch_stats": variables["batch_stats"][name]}


def seg_planar(variables: Dict, x: jnp.ndarray, hw, mask_size: int,
               interpret: bool = False):
    """Seg wrapper (u2net.py:163-179): hard mask + 512 upsample + pyramid.

    Returns (mskx, d0_up NHWC, pyramid: 6x (planar, hw))."""
    outs = u2netp_planar(_sub(variables, "msk"), x, hw, interpret)
    (d0, _), *pyr = outs
    hard = (d0 > 0.5).astype(x.dtype)
    mskx = hard * x
    d0_up = from_planar(
        resize_planar(d0, hw, (mask_size, mask_size), align_corners=True),
        (mask_size, mask_size))
    return mskx, d0_up, tuple(pyr)


def geotr_mask_planar(variables: Dict, x: jnp.ndarray, hw, mask_size: int,
                      interpret: bool = False) -> jnp.ndarray:
    """GeoTrSegInf's mask output (geotr.py:264-279): soft U2NetP mask
    upsampled to ``mask_size`` (NHWC).  The GeoTr transformer branch is
    intentionally absent — its ``bm`` output is dead in the production
    config (``use_init_flow=False``) and DCE'd from the NHWC path too;
    callers that need ``bm`` must use the flax module."""
    (d0, _), *_ = u2netp_planar(_sub(variables, "msk"), x, hw, interpret)
    return from_planar(
        resize_planar(d0, hw, (mask_size, mask_size), align_corners=True),
        (mask_size, mask_size))


def seg_pyramid_to_latent_planar(pyr: Sequence, latent: int) -> jnp.ndarray:
    """Planar equivalent of ``u2net.seg_pyramid_to_latent`` -> NHWC
    (N, latent, latent, 384)."""
    feats = [from_planar(
        resize_planar(t, hw, (latent, latent), align_corners=False),
        (latent, latent)) for (t, hw) in pyr]
    return jnp.concatenate(feats, axis=-1)


# ------------------------------------------------------- text-line UNet
def _double_conv(p: Dict, s: Dict, x, hw, interpret=False):
    sc, bi = _fused_affine(p["conv_0"], p["bn_1"], s["bn_1"])
    x = conv3x3_planar(x, p["conv_0"]["kernel"], sc, bi, hw=hw,
                       act="relu", interpret=interpret)
    sc, bi = _fused_affine(p["conv_3"], p["bn_4"], s["bn_4"])
    return conv3x3_planar(x, p["conv_3"]["kernel"], sc, bi, hw=hw,
                          act="relu", interpret=interpret)


def textline_planar(variables: Dict, x: jnp.ndarray, hw,
                    interpret: bool = False):
    """TextLineUNet forward, planar (textline_unet.py:39-65).
    Returns (feat64 planar @ hw, logits planar @ hw)."""
    p, s = variables["params"], variables["batch_stats"]
    dc = lambda n, t, z: _double_conv(p[n], s[n], t, z, interpret)

    def down(t, z):
        t4 = _view4(t, z)
        y = jax.lax.reduce_window(
            t4, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return _flat(y), (z[0] // 2, z[1] // 2)

    x1 = dc("inc", x, hw)
    t, hw2 = down(x1, hw)
    x2 = dc("down1", t, hw2)
    t, hw3 = down(x2, hw2)
    x3 = dc("down2", t, hw3)
    t, hw4 = down(x3, hw3)
    x4 = dc("down3", t, hw4)
    t, hw5 = down(x4, hw4)
    x5 = dc("down4", t, hw5)

    def up(y, zy, skip, zs, name):
        y = resize_planar(y, zy, zs, align_corners=True)
        return dc(name, jnp.concatenate([skip, y], 1), zs)

    y = up(x5, hw5, x4, hw4, "up1")
    y = up(y, hw4, x3, hw3, "up2")
    y = up(y, hw3, x2, hw2, "up3")
    y = up(y, hw2, x1, hw, "up4")
    logits = conv1x1_planar(
        y, p["outc"]["kernel"], jnp.ones((1,), jnp.float32),
        p["outc"]["bias"].astype(jnp.float32))
    return y, logits


# --------------------------------------------------- DiT conditioning pyramid
def pyramid_planar(params: Dict, y: jnp.ndarray, hw, input_size: int,
                   dtype, interpret: bool = False) -> jnp.ndarray:
    """ConditioningPyramid forward, planar (dit.py:61-91).
    ``y``: (B, 4, Pp) planar RGB+mask at 512^2 -> NHWC (B, S, S, 256)."""
    if input_size not in (64,):
        raise NotImplementedError(
            "planar pyramid serves the production latent 64 only")
    c3 = lambda n, t, z: _plain_conv3(params[n], t, z, "relu", interpret)

    def pool(t, z):
        t4 = _view4(t, z)
        o = jax.lax.reduce_window(
            t4, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return _flat(o), (z[0] // 2, z[1] // 2)

    x = c3("level_0_conv0", y.astype(dtype), hw)
    x, hw = pool(c3("level_1_conv0", x, hw), hw)
    x = c3("level_2_conv0", x, hw)
    x, hw = pool(c3("level_2_conv1", x, hw), hw)
    x = c3("level_3_conv0", x, hw)
    x = c3("level_3_conv1", x, hw)
    x = c3("level_3_conv2", x, hw)
    x, hw = pool(x, hw)
    return from_planar(x, hw)
