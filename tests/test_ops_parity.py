"""Exact-parity tests for resize / grid_sample against torch CPU.

These ops sit in the metric-critical path (loss composition, unwarp),
so we require near-bitwise agreement with torch's kernels.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dvd_tpu.ops import grid_sample, resize_area, resize_bilinear
from dvd_tpu.utils import grids

RNG = np.random.RandomState(0)


def _rand_img(n, h, w, c):
    return RNG.rand(n, h, w, c).astype(np.float32)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "hw_in,hw_out",
    [((64, 64), (512, 512)), ((512, 512), (64, 64)), ((288, 288), (64, 64)),
     ((64, 64), (288, 288)), ((17, 23), (40, 9))],
)
def test_resize_bilinear_matches_torch(align, hw_in, hw_out):
    img = _rand_img(2, *hw_in, 3)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), hw_out, align_corners=align))
    theirs = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        size=hw_out, mode="bilinear", align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "hw_in,hw_out", [((512, 512), (256, 256)), ((512, 512), (64, 64)), ((37, 53), (10, 7))]
)
def test_resize_area_matches_torch(hw_in, hw_out):
    img = _rand_img(2, *hw_in, 3)
    ours = np.asarray(resize_area(jnp.asarray(img), hw_out))
    theirs = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), size=hw_out, mode="area"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(mode, padding, align):
    img = _rand_img(2, 32, 48, 3)
    # grid slightly outside [-1,1] to exercise padding
    grid = (RNG.rand(2, 20, 25, 2).astype(np.float32) * 2.6 - 1.3)
    ours = np.asarray(
        grid_sample(jnp.asarray(img), jnp.asarray(grid),
                    align_corners=align, padding_mode=padding, mode=mode)
    )
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode=mode, padding_mode=padding, align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity_via_base_grid():
    img = _rand_img(1, 16, 16, 2)
    flow = jnp.zeros((1, 16, 16, 2))
    g = grids.flow_to_grid(flow)
    out = np.asarray(grid_sample(jnp.asarray(img), g))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)


def test_grid_sample_grad_flows_to_grid_and_image():
    import jax

    img = jnp.asarray(_rand_img(1, 8, 8, 1))
    grid = grids.flow_to_grid(jnp.zeros((1, 8, 8, 2))) * 0.9

    def loss(im, g):
        return jnp.sum(grid_sample(im, g) ** 2)

    gi, gg = jax.grad(loss, argnums=(0, 1))(img, grid)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gg)).all()
    assert float(jnp.abs(gg).sum()) > 0


def test_base_grid_matches_reference_convention():
    # reference: coords_grid_tensor stacks (x, y) with x varying along W,
    # normalized by (size-1) (gaussian_diffusion.py:23-28,219)
    b = np.asarray(grids.base_grid(4, 8))
    assert b.shape == (4, 8, 2)
    np.testing.assert_allclose(b[0, :, 0], np.linspace(0, 1, 8), atol=1e-6)
    np.testing.assert_allclose(b[:, 0, 1], np.linspace(0, 1, 4), atol=1e-6)


def test_flow_grid_roundtrip():
    f = jnp.asarray(RNG.randn(3, 64, 64, 2).astype(np.float32) * 0.1)
    g = grids.flow_to_grid(f)
    f2 = grids.grid_to_flow(g)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=1e-6)


def test_grid_sample_row_chunk_identical():
    """row_chunk tiles the gather over output rows; values and gradients
    must be identical to the unchunked path."""
    import jax

    r = np.random.RandomState(7)
    img = jnp.asarray(r.rand(2, 32, 24, 3).astype(np.float32))
    grid = jnp.asarray((r.rand(2, 40, 24, 2) * 2.4 - 1.2).astype(np.float32))

    from dvd_tpu.ops.grid_sample import grid_sample

    want = grid_sample(img, grid)
    got = grid_sample(img, grid, row_chunk=8)
    # identical math; tolerance only for XLA fusion reassociation
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def loss(fn_kwargs):
        def f(i, g):
            return jnp.sum(grid_sample(i, g, **fn_kwargs) ** 2)
        return jax.grad(f, argnums=(0, 1))(img, grid)

    gi0, gg0 = loss({})
    gi1, gg1 = loss({"row_chunk": 8})
    np.testing.assert_allclose(np.asarray(gi1), np.asarray(gi0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg0), atol=1e-5)


def test_auto_row_chunk_thresholds():
    from dvd_tpu.ops.grid_sample import auto_row_chunk

    # small outputs: no chunking
    assert auto_row_chunk(2, 512, 512, 3) is None
    # large canvas: chunked, divides rows evenly, bounded transients
    ch = auto_row_chunk(8, 2048, 2048, 3)
    assert ch is not None and 2048 % ch == 0 and ch < 2048


def test_grid_sample_non_divisor_row_chunk_shrinks():
    """An explicit row_chunk that doesn't divide the output rows must
    still bound transients (shrink to a divisor), never silently fall
    back to the unchunked full-size gather."""
    import jax
    import jax.numpy as jnp

    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(2, 9, 9, 3).astype(np.float32))
    grid = jnp.asarray((r.rand(2, 10, 6, 2) * 2 - 1).astype(np.float32))
    from dvd_tpu.ops.grid_sample import grid_sample

    ref = grid_sample(img, grid)
    out = grid_sample(img, grid, row_chunk=7)   # 10 % 7 != 0 -> shrinks to 5
    # one-ulp differences allowed: chunking changes XLA fusion/FMA order
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
