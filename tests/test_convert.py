"""Weight-converter parity tests against standard torch modules.

These validate the conversion mechanics numerically: conv/linear layout
transposition, MultiheadAttention in_proj splitting, frozen BatchNorm, and
the full torchvision-VGG16 pyramid mapping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from dvd_tpu.models.layers import CrossAttention, FrozenBatchNorm
from dvd_tpu.models.vgg import VGG16Pyramid
from dvd_tpu.training import convert as C

RNG = np.random.RandomState(0)


def test_conv_weight_conversion():
    tconv = tnn.Conv2d(3, 8, 3, padding=1)
    x = RNG.rand(2, 5, 7, 3).astype(np.float32)
    want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()

    from flax import linen as nn

    conv = nn.Conv(8, (3, 3), padding=1)
    sd = {k: v.detach().numpy() for k, v in tconv.state_dict().items()}
    variables = C.convert_state_dict(sd, [])
    got = np.asarray(conv.apply({"params": variables["params"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mha_in_proj_split_matches_torch():
    d, h = 16, 4
    tmha = tnn.MultiheadAttention(d, h, batch_first=True)
    tmha.eval()
    q = RNG.rand(2, 5, d).astype(np.float32)
    kv = RNG.rand(2, 9, d).astype(np.float32)
    with torch.no_grad():
        want, _ = tmha(torch.from_numpy(q), torch.from_numpy(kv),
                       torch.from_numpy(kv), need_weights=False)
    want = want.numpy()

    sd = {k: v.detach().numpy() for k, v in tmha.state_dict().items()}
    variables = C.convert_state_dict(sd, [])
    ca = CrossAttention(dim=d, num_heads=h)
    got = np.asarray(
        ca.apply({"params": variables["params"]},
                 jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frozen_batchnorm_matches_torch_eval():
    tbn = tnn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(6) + 0.5)
        tbn.bias.copy_(torch.rand(6))
        tbn.running_mean.copy_(torch.randn(6))
        tbn.running_var.copy_(torch.rand(6) + 0.5)
    tbn.eval()
    x = RNG.rand(2, 4, 4, 6).astype(np.float32)
    with torch.no_grad():
        want = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    sd = {k: v.detach().numpy() for k, v in tbn.state_dict().items()}
    variables = C.convert_state_dict(sd, [])
    fbn = FrozenBatchNorm(6)
    got = np.asarray(fbn.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _vgg16_features_torch():
    """The standard VGG16 `features` stack (through the /8 level we use)
    with torchvision's layer indexing — built from plain torch layers
    (torchvision itself is not installed in this image)."""
    layers = [
        tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(True),          # 0, 1
        tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(True),         # 2, 3
        tnn.MaxPool2d(2, 2),                                      # 4
        tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(True),        # 5, 6
        tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(True),       # 7, 8
        tnn.MaxPool2d(2, 2),                                      # 9
        tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(True),       # 10, 11
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(True),       # 12, 13
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(True),       # 14, 15
        tnn.MaxPool2d(2, 2),                                      # 16
    ]
    return tnn.Sequential(*layers)


def test_vgg16_pyramid_matches_torch_reference():
    feats_t = _vgg16_features_torch()
    feats_t.eval()
    sd = {f"features.{k}": v.detach().numpy()
          for k, v in feats_t.state_dict().items()}
    variables = C.convert_state_dict(sd, C.VGG16_RULES)

    pyr = VGG16Pyramid()
    ref = pyr.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    problems = C.validate_against(variables, ref)
    assert not problems, problems

    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x).permute(0, 3, 1, 2)
        saved = {}
        for i, layer in enumerate(feats_t):
            h = layer(h)
            saved[i] = h
        # level_0 ends at relu idx1; level_2 at pool idx9; level_3 at pool 16
        want = [saved[1], saved[9], saved[16]]

    got = pyr.apply({"params": variables["params"]}, jnp.asarray(x), mode="eigth")
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.permute(0, 2, 3, 1).numpy(), atol=2e-4
        )


def test_validate_against_reports_mismatches():
    ref = {"params": {"a": {"kernel": np.zeros((2, 3))}}}
    bad = {"params": {"a": {"kernel": np.zeros((3, 2))}, "b": {"bias": np.zeros(1)}}}
    problems = C.validate_against(bad, ref)
    assert len(problems) == 2


def test_restore_train_state_migrates_single_tree_ema(tmp_path):
    """Checkpoints written before multi-rate EMA stored ema_params as ONE
    tree; restoring into a tuple-of-trees template must migrate, not die
    on a tree-structure mismatch."""
    import dataclasses

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from dvd_tpu.training.checkpoint import restore_train_state
    from dvd_tpu.training.train_state import TrainState

    tree = {"w": jnp.ones((3,)) * 5.0}
    legacy = TrainState(step=jnp.asarray(7), params=tree,
                        opt_state={"m": jnp.zeros((3,))},
                        ema_params=tree,            # pre-migration layout
                        batch_stats={}, sampler_state=None)
    path = str(tmp_path / "state_7")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, legacy)
    ckptr.wait_until_finished()

    template = dataclasses.replace(
        legacy, ema_params=(jax.tree.map(jnp.zeros_like, tree),
                            jax.tree.map(jnp.zeros_like, tree)))
    restored = restore_train_state(path, template)
    assert isinstance(restored.ema_params, tuple)
    assert len(restored.ema_params) == 2
    for t in restored.ema_params:
        np.testing.assert_array_equal(np.asarray(t["w"]), 5.0)
    assert int(restored.step) == 7
