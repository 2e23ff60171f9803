"""Output-level parity of the production DiT against the reference's own
torch ``cross_model.DiT`` (+ SATRN ``cross_attn.Decoder``).

The reference imports timm (``Attention``/``Mlp``/``PatchEmbed``) and
mmcv/mmengine (``ConvModule``/``BaseModule``) which are not installed in
this environment; both are stubbed below with faithful minimal
re-implementations (same parameter names, same math) so the reference
module can be imported and executed read-only for comparison — the same
technique test_reference_parity.py uses for mpi4py/torchvision.

Because the reference zero-initializes its adaLN gates and final layer
(a random-init forward would be vacuously init_flow), every parameter is
re-randomized before conversion; deterministic buffers that the converter
drops and recomputes (sin-cos pos-embed, SATRN positional encoders) are
left intact.

Covers reference cross_model.py:568-647 (forward incl. the timestep remap
hack :575-579 and the init_feat seeding :596-603) and cross_attn.py:399-458.
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


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_timm_mmcv_stubs():
    """Minimal, faithful stand-ins for the timm/mmcv pieces the reference
    DiT uses.  Parameter names and math match the real libraries (timm
    vision_transformer Attention/Mlp/PatchEmbed; mmcv ConvModule with BN
    registered as ``bn``) so state_dict keys line up with DIT_RULES."""
    import torch
    import torch.nn as nn

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = (self.qkv(x)
                   .reshape(B, N, 3, self.num_heads, self.head_dim)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, bias=True, **kw):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    vt = _stub("timm.models.vision_transformer",
               Attention=Attention, Mlp=Mlp, PatchEmbed=PatchEmbed)
    _stub("timm.models", vision_transformer=vt)
    _stub("timm", models=sys.modules["timm.models"])

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    class ConvModule(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, bias=True, groups=1,
                     norm_cfg=None, act_cfg=None):
            super().__init__()
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding,
                                  groups=groups, bias=bias)
            # mmcv registers the norm under its type-derived name ('bn')
            self.bn = nn.BatchNorm2d(out_channels) if norm_cfg else None
            self.activate = nn.ReLU(inplace=True) if act_cfg else None

        def forward(self, x):
            x = self.conv(x)
            if self.bn is not None:
                x = self.bn(x)
            if self.activate is not None:
                x = self.activate(x)
            return x

    _stub("mmengine.model", BaseModule=BaseModule)
    _stub("mmengine", model=sys.modules["mmengine.model"])
    _stub("mmcv.cnn", ConvModule=ConvModule)
    _stub("mmcv", cnn=sys.modules["mmcv.cnn"])


@pytest.fixture(scope="module")
def ref_cross_model():
    sys.path.insert(0, REF)

    tvu = _stub("torchvision.utils", save_image=lambda *a, **k: None)
    _stub("torchvision", utils=tvu)
    _stub("blobfile", BlobFile=open)
    mpi = _stub("mpi4py.MPI")

    class _Comm:
        def Get_rank(self):
            return 0

        def Get_size(self):
            return 1

        def bcast(self, x, root=0):
            return x

    mpi.COMM_WORLD = _Comm()
    _stub("mpi4py", MPI=mpi)
    _install_timm_mmcv_stubs()

    from train_settings.dvd.improved_diffusion import cross_model

    return cross_model


# buffers the converter drops and our model recomputes deterministically
_KEEP = ("noised_obs_pos_embed", "position_encoder", "num_batches_tracked")


def _rerandomize(tm, seed=0):
    """Fill every converted parameter/buffer with nonzero random values so
    the zero-init adaLN/final layers actually contribute to the output."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = tm.state_dict()
    for k, v in sd.items():
        if any(s in k for s in _KEEP) or not v.is_floating_point():
            continue
        if k.endswith("running_var"):
            v.copy_(0.5 + torch.rand(v.shape, generator=g))
        elif v.ndim >= 2:
            v.copy_(torch.randn(v.shape, generator=g) * 0.05)
        elif k.endswith("weight"):  # norm scales: keep O(1) so signal survives
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


@pytest.fixture(scope="module")
def converted_pair(ref_cross_model):
    import torch

    from dvd_tpu.models.dit import make_dit
    from dvd_tpu.training import convert as C

    torch.manual_seed(0)
    tm = ref_cross_model.DiT_models2["DiT-S/2"](
        input_size=64, in_channels=2, tv=True).eval()
    _rerandomize(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = C.convert_state_dict(sd, C.DIT_RULES)
    jm = make_dit("DiT-S/2", input_size=64, tv=True, chain_blocks=False)
    return tm, jm, variables


def _inputs(b=2, seed=10):
    r = np.random.RandomState(seed)
    f32 = lambda *s: r.rand(*s).astype(np.float32) * 0.5
    return dict(
        x=(f32(b, 64, 64, 2) - 0.25),
        y512=f32(b, 512, 512, 3),
        mask_cat=(f32(b, 512, 512, 1) > 0.25).astype(np.float32),
        mask_y512=f32(b, 64, 64, 384) - 0.25,
        line_msk=f32(b, 64, 64, 64) - 0.25,
        init_flow=0.2 * (f32(b, 64, 64, 2) - 0.25),
        init_feat=f32(b, 64, 64, 256) - 0.25,
    )


def _ref_forward(tm, d, t, mode):
    import torch

    nchw = lambda a: torch.from_numpy(np.ascontiguousarray(
        np.transpose(a, (0, 3, 1, 2))))
    with torch.no_grad():
        pred, feat = tm(
            nchw(d["x"]), torch.tensor(t),
            y512=nchw(d["y512"]), mask_cat=nchw(d["mask_cat"]),
            mask_y512=nchw(d["mask_y512"]), line_msk=nchw(d["line_msk"]),
            init_flow=nchw(d["init_flow"]), init_feat=nchw(d["init_feat"]),
            tv=True, iter=True, mode=mode,
        )
    to_nhwc = lambda z: z.permute(0, 2, 3, 1).numpy()
    return to_nhwc(pred), to_nhwc(feat)


def _jax_forward(jm, variables, d, t, seed, remap):
    import jax.numpy as jnp

    j = {k: jnp.asarray(v) for k, v in d.items()}
    pred, feat = jm.apply(
        variables, j["x"], jnp.asarray(t, jnp.float32),
        y512=j["y512"], mask_cat=j["mask_cat"], mask_y512=j["mask_y512"],
        line_msk=j["line_msk"], init_flow=j["init_flow"],
        init_feat=j["init_feat"],
        seed_init_feat=jnp.asarray(seed, bool), remap_timesteps=remap,
    )
    return np.asarray(pred), np.asarray(feat)


def test_dit_structure_matches(converted_pair):
    import jax
    import jax.numpy as jnp

    _, jm, variables = converted_pair
    d = _inputs(b=1)
    ref_vars = jax.eval_shape(lambda: jm.init(
        jax.random.PRNGKey(0), jnp.asarray(d["x"]),
        jnp.zeros((1,), jnp.float32),
        y512=jnp.asarray(d["y512"]), mask_cat=jnp.asarray(d["mask_cat"]),
        mask_y512=jnp.asarray(d["mask_y512"]),
        line_msk=jnp.asarray(d["line_msk"]),
        init_flow=jnp.asarray(d["init_flow"]),
        init_feat=jnp.asarray(d["init_feat"])))
    want, got = _flatten(ref_vars), _flatten(variables)
    assert set(want) == set(got), (
        f"missing={sorted(set(want) - set(got))[:8]} "
        f"extra={sorted(set(got) - set(want))[:8]}")
    for k in want:
        assert tuple(want[k].shape) == tuple(np.shape(got[k])), k


# (t values, mode, expected seed mask, remap) — the four timestep regimes:
# sampling t=T-1 (remap->2, whole batch seeded), sampling mid/last steps,
# and a training-mode call with per-row t==2 seeding (no remap).
CASES = [
    pytest.param([666.7, 666.7], None, [True, True], True, id="sample_t2"),
    pytest.param([333.3, 333.3], None, [False, False], True, id="sample_t1"),
    pytest.param([0.0, 0.0], None, [False, False], True, id="sample_t0"),
    pytest.param([2, 0], "train", [True, False], False, id="train_rowseed"),
]


@pytest.mark.parametrize("t,mode,seed,remap", CASES)
def test_dit_output_parity(converted_pair, t, mode, seed, remap):
    tm, jm, variables = converted_pair
    d = _inputs()
    want_pred, want_feat = _ref_forward(tm, d, t, mode)
    got_pred, got_feat = _jax_forward(jm, variables, d, t, seed, remap)
    np.testing.assert_allclose(got_feat, want_feat, atol=1e-3)
    np.testing.assert_allclose(got_pred, want_pred, atol=1e-3)


def test_convert_ckpt_cli_end_to_end(converted_pair, tmp_path):
    """Reference-format ``model.pt`` -> cli.convert_ckpt --validate ->
    msgpack -> forward parity.  Mirrors converting the shipped
    ``model1852000.pt`` (a plain torch state dict, val_TDiff.py:79)."""
    import torch

    from dvd_tpu.cli.convert_ckpt import convert
    from dvd_tpu.models.dit import make_dit
    from dvd_tpu.training.checkpoint import load_variables

    tm, _, _ = converted_pair
    src = tmp_path / "model000000.pt"
    dst = tmp_path / "model000000.msgpack"
    torch.save(tm.state_dict(), src)

    convert("dit", str(src), str(dst), validate=True)

    variables = load_variables(str(dst))
    jm = make_dit("DiT-S/2", input_size=64, tv=True, chain_blocks=False)
    d = _inputs(seed=11)
    want_pred, want_feat = _ref_forward(tm, d, [666.7, 666.7], None)
    got_pred, got_feat = _jax_forward(
        jm, variables, d, [666.7, 666.7], [True, True], True)
    np.testing.assert_allclose(got_feat, want_feat, atol=1e-3)
    np.testing.assert_allclose(got_pred, want_pred, atol=1e-3)
