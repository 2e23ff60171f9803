"""Parity: planar-layout aux-net forwards vs the NHWC flax modules.

Covers (1) the Pallas planar conv kernel itself in interpret mode
against the XLA planar fallback (same contract), and (2) the full
planar model forwards (`models/planar_aux.py`) against the flax NHWC
modules on the SAME variables — catching layout bookkeeping, ceil-pool
chains, resize conventions, and BN fusion mistakes.  All f32 on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.models import planar_aux as pa
from dvd_tpu.ops.pallas.planar_conv import (_conv3x3_planar_xla,
                                            conv3x3_planar, pad_p)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize(
    "cin,cout,hw,dil", [
        (3, 16, (16, 11), 1),      # image-entry shape, 9-tap group
        (16, 16, (16, 11), 1),     # U2NetP mid shape
        (16, 16, (9, 9), 2),       # dilated bottleneck
        (16, 16, (6, 5), 4),       # heavy dilation on a tiny plane
        (48, 64, (12, 12), 1),     # decoder concat -> out
        (160, 8, (8, 8), 1),       # Cin > 128: chunked K loop
    ])
def test_kernel_interpret_matches_xla(cin, cout, hw, dil):
    k = jax.random.PRNGKey(hash((cin, cout, hw, dil)) % 2**31)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    pp = pad_p(*hw)
    x = _rand(k1, (2, cin, pp))
    # pad lanes must be finite but are otherwise don't-care
    w = _rand(k2, (3, 3, cin, cout)) * 0.2
    scale = _rand(k3, (cout,)) * 0.1 + 1.0
    bias = _rand(k4, (cout,)) * 0.1
    got = conv3x3_planar(x, w, scale, bias, hw=hw, dilation=dil,
                         act="relu", interpret=True)
    want = _conv3x3_planar_xla(x, w, scale, bias, hw=hw, dilation=dil,
                               act="relu", out_dtype=x.dtype)
    n = hw[0] * hw[1]
    np.testing.assert_allclose(got[:, :, :n], want[:, :, :n],
                               rtol=1e-5, atol=1e-5)


def test_kernel_interpret_multitile():
    """Forces the 3-case halo DMA path (first/middle/last tiles)."""
    hw = (8, 128)
    pp = pad_p(*hw)          # 1024
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    x = _rand(k1, (1, 16, pp))
    w = _rand(k2, (3, 3, 16, 16)) * 0.2
    s = jnp.ones((16,))
    b = jnp.zeros((16,))
    got = conv3x3_planar(x, w, s, b, hw=hw, act=None, interpret=True,
                         tile_override=256)   # 4 tiles, halo_pad=256
    want = _conv3x3_planar_xla(x, w, s, b, hw=hw, dilation=1, act=None,
                               out_dtype=x.dtype)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------- model parity
def test_u2netp_planar_matches_flax():
    from dvd_tpu.models.u2net import U2NetP

    hw = (48, 48)
    net = U2NetP(1, jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, *hw, 3))
    variables = net.init(jax.random.PRNGKey(2), x)
    ref = net.apply(variables, x)

    outs = pa.u2netp_planar(variables, pa.to_planar(x), hw)
    for (got_pl, ghw), want in zip(outs, ref):
        got = pa.from_planar(got_pl, ghw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_seg_planar_matches_flax():
    from dvd_tpu.models.u2net import Seg

    hw = (48, 48)
    net = Seg(mask_size=96, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, *hw, 3))
    variables = net.init(jax.random.PRNGKey(4), x)
    mskx_r, d0_r, *pyr_r = net.apply(variables, x)

    mskx_p, d0_p, pyr_p = pa.seg_planar(variables, pa.to_planar(x), hw, 96)
    np.testing.assert_allclose(np.asarray(d0_p), np.asarray(d0_r),
                               rtol=1e-4, atol=1e-4)
    for (got_pl, ghw), want in zip(pyr_p, pyr_r):
        np.testing.assert_allclose(
            np.asarray(pa.from_planar(got_pl, ghw)), np.asarray(want),
            rtol=1e-4, atol=1e-4)
    # the hard 0.5-threshold mask may flip on pixels where d0 ~ 0.5
    # (random-init nets sit near 0.5 everywhere); require the mismatch
    # fraction to be small rather than elementwise equality
    mskx_got = np.asarray(pa.from_planar(mskx_p, hw))
    diff = np.abs(mskx_got - np.asarray(mskx_r))
    assert (diff > 1e-3).mean() < 0.02, diff.max()


def test_textline_planar_matches_flax():
    from dvd_tpu.models.textline_unet import TextLineUNet

    hw = (48, 48)
    net = TextLineUNet(jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, *hw, 3))
    variables = net.init(jax.random.PRNGKey(6), x)
    feat_r, logits_r = net.apply(variables, x)

    feat_p, logits_p = pa.textline_planar(variables, pa.to_planar(x), hw)
    np.testing.assert_allclose(
        np.asarray(pa.from_planar(feat_p, hw)), np.asarray(feat_r),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pa.from_planar(logits_p, hw)), np.asarray(logits_r),
        rtol=1e-4, atol=1e-4)


def test_pyramid_planar_matches_flax():
    from dvd_tpu.models.dit import ConditioningPyramid

    hw = (64, 64)
    net = ConditioningPyramid(64, jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, *hw, 4))
    variables = net.init(jax.random.PRNGKey(8), x)
    ref = net.apply(variables, x)

    got = pa.pyramid_planar(variables["params"], pa.to_planar(x), hw, 64,
                            jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
