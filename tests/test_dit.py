"""Shape / semantics tests for the DiT denoiser.

Uses the 16^2-latent / 128^2-image configuration (structurally identical to
the production 64/512 one, exercising the same code paths) to keep CPU test
time sane.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.models.dit import DiT, unpatchify

S = 16      # latent size
IMG = 128   # conditioning image size (= 8 * S)


def _cond_inputs(n=2, s=S):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    return dict(
        y512=jax.random.normal(ks[0], (n, IMG, IMG, 3)) * 0.1,
        mask_cat=jnp.ones((n, IMG, IMG, 1)),
        mask_y512=jax.random.normal(ks[1], (n, s, s, 384)) * 0.1,
        line_msk=jax.random.normal(ks[2], (n, s, s, 64)) * 0.1,
        init_flow=jax.random.normal(ks[3], (n, s, s, 2)) * 0.01,
        init_feat=jnp.zeros((n, s, s, 256)),
        seed_init_feat=jnp.array([True] * n),
    )


def _tiny_dit(tv=True, chain=False):
    return DiT(input_size=S, patch_size=2, in_channels=2, hidden_size=48,
               depth=2, num_heads=3, tv=tv, chain_blocks=chain)


def _perturb_final_layer(params):
    p = flax.core.unfreeze(params)
    fl = p["params"]["final_layer2"]
    fl["linear"]["kernel"] = jnp.ones_like(fl["linear"]["kernel"]) * 0.01
    fl["adaLN_modulation_1"]["kernel"] = (
        jnp.ones_like(fl["adaLN_modulation_1"]["kernel"]) * 0.01
    )
    return flax.core.freeze(p)


@pytest.fixture(scope="module")
def dit_and_params():
    model = _tiny_dit()
    x = jnp.zeros((2, S, S, 2))
    t = jnp.array([666.7, 666.7])
    params = model.init(jax.random.PRNGKey(0), x, t, **_cond_inputs())
    return model, params


def test_forward_shapes(dit_and_params):
    model, params = dit_and_params
    x = jnp.ones((2, S, S, 2)) * 0.1
    t = jnp.array([666.7, 666.7])
    pred, feat = model.apply(params, x, t, **_cond_inputs())
    assert pred.shape == (2, S, S, 2)
    assert feat.shape == (2, S, S, 256)
    assert np.isfinite(np.asarray(pred)).all()


def test_zero_init_identity(dit_and_params):
    """adaLN-zero + zero final layer => output == init_flow at init."""
    model, params = dit_and_params
    cond = _cond_inputs()
    x = jnp.ones((2, S, S, 2)) * 0.3
    t = jnp.array([0.0, 0.0])
    pred, _ = model.apply(params, x, t, **cond)
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(cond["init_flow"]), atol=1e-5
    )


def test_timestep_remap(dit_and_params):
    """With remap on, t=666.7 and t=2 must embed identically; t=666.7 with
    remap off must differ (sampling-mode hack, cross_model.py:575-579)."""
    model, params0 = dit_and_params
    params = _perturb_final_layer(params0)
    cond = _cond_inputs()
    x = jnp.ones((2, S, S, 2)) * 0.1

    out_remap, _ = model.apply(params, x, jnp.array([666.7, 666.7]), **cond,
                               remap_timesteps=True)
    out_int, _ = model.apply(params, x, jnp.array([2.0, 2.0]), **cond,
                             remap_timesteps=True)
    out_noremap, _ = model.apply(params, x, jnp.array([666.7, 666.7]), **cond,
                                 remap_timesteps=False)
    np.testing.assert_allclose(np.asarray(out_remap), np.asarray(out_int), atol=1e-6)
    assert np.abs(np.asarray(out_remap) - np.asarray(out_noremap)).max() > 1e-6


def test_dead_block_quirk(dit_and_params):
    """chain_blocks=False: mangling every block but the last must not change
    the output (reference cross_model.py:615-616 semantics)."""
    model, params0 = dit_and_params
    params = _perturb_final_layer(params0)
    cond = _cond_inputs()
    x = jnp.ones((2, S, S, 2)) * 0.1
    t = jnp.array([666.7, 666.7])
    base, _ = model.apply(params, x, t, **cond)

    p = flax.core.unfreeze(params)
    p["params"]["blocks_0"] = jax.tree.map(
        lambda a: a * 0.0 + 7.0, p["params"]["blocks_0"]
    )
    out, _ = model.apply(flax.core.freeze(p), x, t, **cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_chained_mode_uses_all_blocks():
    model = _tiny_dit(chain=True)
    cond = _cond_inputs()
    x = jnp.ones((2, S, S, 2)) * 0.1
    t = jnp.array([2.0, 2.0])
    params = _perturb_final_layer(
        model.init(jax.random.PRNGKey(2), x, t, **cond)
    )
    # make blocks non-trivial (adaLN starts at zero -> gates are zero, but
    # the cross-attn branch additions already mix streams)
    base, _ = model.apply(params, x, t, **cond)
    p = flax.core.unfreeze(params)
    p["params"]["blocks_0"] = jax.tree.map(
        lambda a: a + 0.05, p["params"]["blocks_0"]
    )
    out, _ = model.apply(flax.core.freeze(p), x, t, **cond)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-7


def test_unpatchify_roundtrip():
    n, g, p, c = 2, 4, 2, 3
    img = np.random.RandomState(0).rand(n, g * p, g * p, c).astype(np.float32)
    x = img.reshape(n, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(n, g * g, p * p * c)
    out = np.asarray(unpatchify(jnp.asarray(x), p, c))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_non_tv_has_three_streams():
    model = _tiny_dit(tv=False)
    cond = _cond_inputs()
    cond.pop("init_feat")
    cond.pop("seed_init_feat")
    x = jnp.zeros((2, S, S, 2))
    t = jnp.array([2.0, 2.0])
    params = model.init(jax.random.PRNGKey(0), x, t, **cond)
    pred, feat = model.apply(params, x, t, **cond)
    assert pred.shape == (2, S, S, 2)
    dec_kernel = params["params"]["decoder"]["layer_stack_0"]["attn"]["linear_q"]["kernel"]
    assert dec_kernel.shape[0] == 3 * 48


def test_stream_token_bypass_bit_exact(dit_and_params):
    """The serving-side embedder hoist (embed_stream_tokens + the
    *_tokens bypasses) is bit-identical to the in-model path: same flax
    submodules, same inputs, just outside the sampling loop."""
    from dvd_tpu.models.dit import (conditioning_pyramid_features,
                                    embed_stream_tokens)

    model, params = dit_and_params
    cond = _cond_inputs()
    x = jax.random.normal(jax.random.PRNGKey(5), (2, S, S, 2)) * 0.1
    t = jnp.array([666.7, 333.3])
    # perturb the final layer so outputs are nonzero (adaLN-zero init)
    params = _perturb_final_layer(params)

    ref, ref_feat = model.apply(params, x, t, **cond)

    src_feat = conditioning_pyramid_features(
        params["params"]["pyramid"],
        cond["y512"], cond["mask_cat"], S, model.dtype)
    toks = embed_stream_tokens(
        model, params["params"], feat=src_feat,
        mask_y512=cond["mask_y512"], line_msk=cond["line_msk"])
    assert set(toks) == {"cond_tokens", "msk6_tokens", "line_tokens"}
    hoisted = dict(cond, mask_y512=None, line_msk=None,
                   src_feat=src_feat, **toks)
    out, out_feat = model.apply(params, x, t, **hoisted)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(ref_feat), np.asarray(out_feat))
