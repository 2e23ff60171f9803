"""Full-model output parity against the reference's own torch modules.

The strongest converter evidence available without trained weights:
random-initialize the *reference's* aux networks (pure-torch modules under
/root/reference), convert their state dicts with our converter rules, and
compare forward outputs elementwise.  The reference DiT cannot be imported
here (needs timm/mmcv), so its conversion is covered structurally by
test_convert.py.

These tests execute reference code read-only for comparison; nothing is
copied.  Skipped when /root/reference is absent (e.g. CI without the
mounted reference).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "train_settings")),
        reason="reference repo not mounted",
    ),
]


@pytest.fixture(scope="module")
def ref_geotr_core():
    """Import the reference geotr_core with stubs for modules absent in
    this env (imported at module scope, unused by the aux forward paths)."""
    sys.path.insert(0, REF)

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    tvu = stub("torchvision.utils", save_image=lambda *a, **k: None)
    stub("torchvision").utils = tvu
    stub("blobfile", BlobFile=open)
    mpi = stub("mpi4py.MPI")

    class _Comm:
        def Get_rank(self):
            return 0

        def Get_size(self):
            return 1

        def bcast(self, x, root=0):
            return x

    mpi.COMM_WORLD = _Comm()
    stub("mpi4py").MPI = mpi

    import torch

    # geotr_core.py:529 hard-codes .cuda() when building the attention mask
    torch.Tensor.cuda = lambda self, *a, **k: self

    from train_settings.models.geotr import geotr_core

    return geotr_core


def _convert(tm, rules):
    from dvd_tpu.training import convert as C

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    return C.convert_state_dict(sd, rules)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if hasattr(v, "items"):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _structure_matches(jm, variables, x):
    import jax
    import jax.numpy as jnp

    ref_vars = jax.eval_shape(
        lambda: jm.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    want = _flatten(ref_vars)
    got = _flatten(variables)
    assert set(want) == set(got), (
        f"missing={sorted(set(want)-set(got))[:5]} "
        f"extra={sorted(set(got)-set(want))[:5]}")
    for k in want:
        assert tuple(want[k].shape) == tuple(np.shape(got[k])), k


def test_u2netp_output_parity(ref_geotr_core):
    import jax.numpy as jnp
    import torch

    from dvd_tpu.models.u2net import U2NetP
    from dvd_tpu.training import convert as C

    torch.manual_seed(0)
    tm = ref_geotr_core.U2NETP(3, 1).eval()
    variables = _convert(tm, C.U2NETP_RULES)
    jm = U2NetP(1)

    x = np.random.RandomState(1).rand(1, 96, 96, 3).astype(np.float32)
    _structure_matches(jm, variables, x)
    with torch.no_grad():
        touts = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    jouts = jm.apply(variables, jnp.asarray(x))
    for i, (a, b) in enumerate(zip(touts, jouts)):
        a = a.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(b), a, atol=2e-4,
                                   err_msg=f"output {i}")


def test_geotr_output_parity(ref_geotr_core):
    import jax.numpy as jnp
    import torch

    from dvd_tpu.models.geotr import GeoTr
    from dvd_tpu.training import convert as C

    torch.manual_seed(0)
    tm = ref_geotr_core.GeoTr(num_attn_layers=6, num_token=36 * 36).eval()
    variables = _convert(tm, C.GEOTR_SEG_RULES)
    jm = GeoTr(6, 256)

    x = np.random.RandomState(2).rand(1, 288, 288, 3).astype(np.float32)
    _structure_matches(jm, variables, x)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    jout = jm.apply(variables, jnp.asarray(x))
    a = tout.permute(0, 2, 3, 1).numpy()
    # CPU-backend parity is ~6e-6; allow slack for accumulation
    np.testing.assert_allclose(np.asarray(jout), a, atol=5e-4)


def test_line_unet_output_parity(ref_geotr_core):
    import jax.numpy as jnp
    import torch

    from dvd_tpu.models.textline_unet import TextLineUNet
    from dvd_tpu.training import convert as C

    sys.path.insert(0, REF)
    from train_settings.models.geotr.unet_model import UNet

    torch.manual_seed(0)
    tm = UNet(n_channels=3, n_classes=1).eval()  # val_TDiff.py:64
    variables = _convert(tm, C.LINE_UNET_RULES)
    jm = TextLineUNet()

    x = np.random.RandomState(3).rand(1, 96, 96, 3).astype(np.float32)
    _structure_matches(jm, variables, x)
    with torch.no_grad():
        tfeat, tlogits = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    jfeat, jlogits = jm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(jfeat), tfeat.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_seg_wrapper_output_parity(ref_geotr_core):
    """Seg (geotr_core.py:984-995): hard-masked image + the six decoder
    side features that become the seg_map_all conditioning."""
    import jax.numpy as jnp
    import torch

    from dvd_tpu.models.u2net import Seg
    from dvd_tpu.training import convert as C

    torch.manual_seed(0)
    tm = ref_geotr_core.Seg().eval()
    variables = _convert(tm, C.U2NETP_RULES)
    jm = Seg(mask_size=512)   # reference hard-codes the 512 upsample

    x = np.random.RandomState(4).rand(1, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        touts = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    jouts = jm.apply(variables, jnp.asarray(x))
    # (mskx, msk_up, hx6, hx5d, hx4d, hx3d, hx2d, hx1d) — all 8 compared
    assert len(touts) == len(jouts) == 8
    for i, (a, b) in enumerate(zip(touts, jouts)):
        a = a.permute(0, 2, 3, 1).numpy()
        b = np.asarray(b)
        assert a.shape == b.shape, f"output {i}: {a.shape} vs {b.shape}"
        np.testing.assert_allclose(b, a, atol=2e-4, err_msg=f"output {i}")
