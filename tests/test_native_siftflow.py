"""Native C++ dense-registration engine (dvd_tpu.native.sift_flow).

Builds the shared library with the system g++ on first use; these tests
exercise known-transform recovery and the metrics integration.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from dvd_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}"
)


def _textured(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    return ndi.gaussian_filter(rng.rand(h, w).astype(np.float32) * 255, 1.5)


def test_recovers_integer_shift():
    a = _textured()
    dx, dy = 4, -3
    b = np.roll(np.roll(a, dy, axis=0), dx, axis=1)
    flow = native.sift_flow(a, b)
    inner = flow[16:-16, 16:-16]
    assert float(np.median(inner[..., 0])) == pytest.approx(dx, abs=0.5)
    assert float(np.median(inner[..., 1])) == pytest.approx(dy, abs=0.5)


def test_identity_flow_is_zero():
    a = _textured(seed=1)
    flow = native.sift_flow(a, a)
    assert float(np.abs(flow).mean()) < 0.05


def test_smooth_warp_low_residual():
    a = _textured(128, 128, seed=2)
    ys, xs = np.meshgrid(np.arange(128.0), np.arange(128.0), indexing="ij")
    wob = 3.0 * np.sin(ys / 24.0)
    b = ndi.map_coordinates(a, [ys, xs + wob], order=1, mode="nearest")
    flow = native.sift_flow(a, b)
    # recovered dx should correlate with -wob (b sampled at x+wob means
    # content moved left by wob): check mean abs error in the interior
    err = np.abs(flow[16:-16, 16:-16, 0] + wob[16:-16, 16:-16])
    assert float(np.median(err)) < 1.5


def test_rejects_bad_shapes():
    a = _textured()
    with pytest.raises(ValueError):
        native.sift_flow(a, a[:-2])


def test_metrics_native_backend():
    from dvd_tpu.evaluation.metrics import (aligned_distortion,
                                            local_distortion)

    a = _textured(120, 120, seed=3)
    rgb = np.stack([a, a, a], -1)
    # identical images -> zero distortion under the native backend
    assert local_distortion(rgb, rgb, backend="native") == pytest.approx(0.0, abs=1e-3)
    # a shifted copy has LD ~ shift magnitude; AD drops sharply once the
    # global translation is removed (residuals come only from the
    # np.roll wrap seam at the border)
    shifted = np.roll(rgb, 5, axis=1)
    ld = local_distortion(shifted, rgb, backend="native")
    ad = aligned_distortion(shifted, rgb, backend="native")
    assert 3.0 < ld < 7.0
    assert ad < 0.6 * ld


def test_calibration_against_oracle_flow():
    """Both registration backends must land within a few percent of the
    analytically-known registration flow on a warped text document (the
    full-size calibration evidence lives in
    docs/registration_calibration.json; this is the fast regression)."""
    from dvd_tpu.evaluation.calibrate import (_ld_ad, apply_warp,
                                              oracle_registration_flow,
                                              random_warp_field,
                                              render_document)
    from dvd_tpu.evaluation.metrics import dense_registration_flow

    gt = render_document(320, 256, seed=11)
    u = random_warp_field(320, 256, magnitude=5.0, seed=12)
    warped = apply_warp(gt, u)
    ld_o, ad_o = _ld_ad(oracle_registration_flow(u), gt)
    assert ld_o > 2.0  # sanity: the warp is non-trivial

    for backend in ("native", "dis"):
        fl = dense_registration_flow(warped, gt, backend=backend)
        ld, ad = _ld_ad(fl, gt)
        assert abs(ld - ld_o) / ld_o < 0.08, (backend, ld, ld_o)
        assert abs(ad - ad_o) / ad_o < 0.08, (backend, ad, ad_o)
