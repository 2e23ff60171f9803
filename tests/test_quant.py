"""Dynamic-int8 serving path (ops/quant.py + the quant=True modules).

The quantized modules must (a) keep the parameter tree bit-identical to
the fp modules (checkpoint compatibility), and (b) stay numerically close
to the fp path — dynamic W8A8 with per-token/per-channel scales has a
~1/127 per-op quantization step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.ops.quant import int8_dense


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_int8_dense_close_to_exact():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (64, 96), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (96, 128)) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 2), (128,)) * 0.1
    got = int8_dense(x, w, b)
    want = x @ w + b
    assert _rel_err(got, want) < 0.02


def test_int8_dense_batched_rank3():
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (2, 17, 48), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (48, 32)) * 0.1
    got = int8_dense(x, w)
    want = jnp.einsum("btk,kn->btn", x, w)
    assert got.shape == (2, 17, 32)
    assert _rel_err(got, want) < 0.03


def test_int8_dense_zero_rows_safe():
    x = jnp.zeros((4, 8), jnp.float32)
    w = jnp.ones((8, 3), jnp.float32)
    out = int8_dense(x, w)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_qdense_param_tree_matches_nn_dense():
    from flax import linen as nn

    from dvd_tpu.models.layers import QDense

    x = jnp.ones((2, 16))
    ref = nn.Dense(24, name="d").init(jax.random.PRNGKey(0), x)
    q = QDense(24, True, True, name="d").init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(ref) == jax.tree.structure(q)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(q)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_satrn_decoder_quant_tree_and_numerics():
    from dvd_tpu.models import satrn

    kw = dict(n_layers=2, n_head=2, d_k=16, d_v=16, d_model=32,
              n_position=4, d_inner=48, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 32))
    fp = satrn.Decoder(**kw)
    qd = satrn.Decoder(quant=True, **kw)
    vars_fp = fp.init(jax.random.PRNGKey(2), x)
    vars_q = qd.init(jax.random.PRNGKey(2), x)
    assert jax.tree.structure(vars_fp) == jax.tree.structure(vars_q)

    # same variables through both paths
    out_fp = fp.apply(vars_fp, x)
    out_q = qd.apply(vars_fp, x)
    assert _rel_err(out_q, out_fp) < 0.08


def test_dit_quant_end_to_end_close():
    from dvd_tpu.models.dit import make_dit

    def build(quant):
        return make_dit("DiT-mini", input_size=16, in_channels=2, tv=True,
                        quant=quant)

    dit_fp = build(False)
    dit_q = build(True)
    k = jax.random.PRNGKey(0)
    args = dict(
        x=jnp.zeros((1, 16, 16, 2)),
        t=jnp.zeros((1,)),
        y512=jax.random.normal(k, (1, 128, 128, 3)) * 0.2,
        mask_cat=jnp.ones((1, 128, 128, 1)),
        mask_y512=jax.random.normal(k, (1, 16, 16, 384)) * 0.2,
        line_msk=jax.random.normal(k, (1, 16, 16, 64)) * 0.2,
        init_flow=jnp.zeros((1, 16, 16, 2)),
        init_feat=jnp.zeros((1, 16, 16, 256)),
    )
    vs = dit_fp.init(jax.random.PRNGKey(1), **args, remap_timesteps=False)
    assert jax.tree.structure(vs) == jax.tree.structure(
        dit_q.init(jax.random.PRNGKey(1), **args, remap_timesteps=False))

    # perturb params so the adaLN-zero final layer produces nonzero output
    vs = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.PRNGKey(5), a.shape,
                                               a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, vs)

    out_fp, feat_fp = dit_fp.apply(vs, **args, remap_timesteps=False)
    out_q, feat_q = dit_q.apply(vs, **args, remap_timesteps=False)
    # the conditioning pyramid is unquantized -> identical
    np.testing.assert_allclose(np.asarray(feat_q), np.asarray(feat_fp))
    assert np.all(np.isfinite(np.asarray(out_q)))
    assert _rel_err(out_q, out_fp) < 0.25
    # correlation of the predicted flow stays high
    a = np.asarray(out_q).ravel() - np.asarray(out_q).mean()
    b = np.asarray(out_fp).ravel() - np.asarray(out_fp).mean()
    denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
    assert float(a @ b) / denom > 0.98
