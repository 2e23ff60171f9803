"""Output-level parity of the alternative denoiser families against the
reference's own torch modules:

- ``UNetModel_stage1`` (``improved_diffusion/unet.py:552-853``) vs
  :class:`dvd_tpu.models.unet_denoiser.UNetDenoiser` at the production
  config the registry builds (latent 64, channel_mult (1,2,3,4),
  num_res_blocks 3, attention at ds 4/8, heads 4, scale-shift norm).
- ``DDIMWithTransformer`` (``improved_diffusion/transformer.py:57-137``)
  vs :class:`dvd_tpu.models.transformer_denoiser.TransformerDenoiser`
  (ff_dim 1024 / 6 layers, the factory's fixed values,
  ``script_util.py:139-148``).

Same technique as test_dit_reference_parity: import the reference module
read-only with a torchvision stub, re-randomize every parameter (the
zero-init output convs would otherwise make the test vacuous), convert
the state dict through ``training/convert.py``, and compare forwards.
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
def ref_modules():
    sys.path.insert(0, REF)
    tvu = types.ModuleType("torchvision.utils")
    tvu.save_image = lambda *a, **k: None
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    tv.utils = tvu
    sys.modules.setdefault("torchvision.utils", tvu)

    from train_settings.dvd.improved_diffusion import transformer, unet

    return unet, transformer


def _rerandomize(tm, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = tm.state_dict()
    for k, v in sd.items():
        if not v.is_floating_point():
            continue
        if v.ndim >= 2:
            v.copy_(torch.randn(v.shape, generator=g) * 0.05)
        elif k.endswith("weight"):  # norm scales: keep O(1)
            v.copy_(1.0 + 0.2 * torch.randn(v.shape, generator=g))
        else:
            v.copy_(0.1 * torch.randn(v.shape, generator=g))
    tm.load_state_dict(sd)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if hasattr(v, "items"):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _inputs(b=2, seed=3):
    r = np.random.RandomState(seed)
    f32 = lambda *s: r.rand(*s).astype(np.float32) - 0.5
    return dict(
        x=f32(b, 64, 64, 2),
        src_feat=f32(b, 64, 64, 64),
        init_flow=0.2 * f32(b, 64, 64, 2),
    )


def _nchw(a):
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2))))


def _our_model(train_mode):
    from dvd_tpu.config import default_config
    from dvd_tpu.models.registry import create_model

    cfg = default_config().replace(
        model={"train_mode": train_mode, "compute_dtype": "float32"})
    return create_model(cfg)


def _assert_structure(jm, variables, d):
    import jax
    import jax.numpy as jnp

    ref_vars = jax.eval_shape(lambda: jm.init(
        jax.random.PRNGKey(0), jnp.asarray(d["x"]),
        jnp.zeros((d["x"].shape[0],), jnp.float32),
        src_feat=jnp.asarray(d["src_feat"]),
        init_flow=jnp.asarray(d["init_flow"])))
    want, got = _flatten(ref_vars), _flatten(variables)
    assert set(want) == set(got), (
        f"missing={sorted(set(want) - set(got))[:8]} "
        f"extra={sorted(set(got) - set(want))[:8]}")
    for k in want:
        assert tuple(want[k].shape) == tuple(np.shape(got[k])), k


@pytest.fixture(scope="module")
def unet_pair(ref_modules):
    import torch

    from dvd_tpu.training import convert as C

    unet, _ = ref_modules
    torch.manual_seed(0)
    tm = unet.UNetModel_stage1(
        in_channels=68, model_channels=128, out_channels=2,
        num_res_blocks=3, attention_resolutions=(4, 8),
        channel_mult=(1, 2, 3, 4), num_heads=4, num_heads_upsample=-1,
        use_scale_shift_norm=True, train_mode="stage_1").eval()
    _rerandomize(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd = C.preprocess_unet_attention(sd, num_heads=4)
    variables = C.convert_state_dict(
        sd, C.unet_rules((1, 2, 3, 4), 3, (4, 8)))
    return tm, _our_model("stage_1"), variables


def test_unet_structure(unet_pair):
    tm, jm, variables = unet_pair
    _assert_structure(jm, variables, _inputs(b=1))


@pytest.mark.parametrize("t", [[667.0, 333.0], [0.0, 2.0]])
def test_unet_output_parity(unet_pair, t):
    import jax.numpy as jnp
    import torch

    tm, jm, variables = unet_pair
    d = _inputs()
    with torch.no_grad():
        want = tm(_nchw(d["x"]), torch.tensor(t),
                  src_feat=_nchw(d["src_feat"]),
                  init_flow=_nchw(d["init_flow"]))
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(jm.apply(
        variables, jnp.asarray(d["x"]), jnp.asarray(t, jnp.float32),
        src_feat=jnp.asarray(d["src_feat"]),
        init_flow=jnp.asarray(d["init_flow"])))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.fixture(scope="module")
def transformer_pair(ref_modules):
    import torch

    from dvd_tpu.training import convert as C

    _, transformer = ref_modules
    torch.manual_seed(1)
    tm = transformer.DDIMWithTransformer(
        in_channels=68, model_channels=128, out_channels=2, num_heads=4,
        num_layers=6, ff_dim=1024, dropout=0.0,
        train_mode="stage_1_transformer").eval()
    _rerandomize(tm, seed=1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = C.convert_state_dict(sd, C.TRANSFORMER_RULES)
    return tm, _our_model("stage_1_transformer"), variables


def test_transformer_structure(transformer_pair):
    tm, jm, variables = transformer_pair
    _assert_structure(jm, variables, _inputs(b=1))


@pytest.mark.parametrize("t", [[667.0, 333.0], [0.0, 2.0]])
def test_transformer_output_parity(transformer_pair, t):
    import jax.numpy as jnp
    import torch

    tm, jm, variables = transformer_pair
    d = _inputs(seed=5)
    with torch.no_grad():
        want = tm(_nchw(d["x"]), torch.tensor(t),
                  src_feat=_nchw(d["src_feat"]),
                  init_flow=_nchw(d["init_flow"]))
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(jm.apply(
        variables, jnp.asarray(d["x"]), jnp.asarray(t, jnp.float32),
        src_feat=jnp.asarray(d["src_feat"]),
        init_flow=jnp.asarray(d["init_flow"])))
    np.testing.assert_allclose(got, want, atol=2e-4)
