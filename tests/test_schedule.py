"""Golden-number tests for the diffusion schedule & DDIM math.

The tables are deterministic float64 recurrences, so we re-derive them with
an independent tiny numpy implementation and cross-check the DDIM update
algebraically (eta=0, START_X).
"""

import jax.numpy as jnp
import numpy as np

from dvd_tpu.diffusion import gaussian as G
from dvd_tpu.diffusion.schedule import (
    cosine_betas,
    linear_betas,
    make_schedule,
    space_timesteps,
)


def test_cosine_betas_T3_golden():
    # independent recomputation of the alpha_bar discretization
    import math

    ab = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    expected = [min(1 - ab((i + 1) / 3) / ab(i / 3), 0.999) for i in range(3)]
    np.testing.assert_allclose(cosine_betas(3), expected, rtol=1e-12)


def test_linear_betas_endpoints():
    b = linear_betas(1000)
    assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)


def test_schedule_tables_consistent():
    s = make_schedule(steps=3, schedule_name="cosine", respacing="")
    acp = np.asarray(s.alphas_cumprod, dtype=np.float64)
    betas = np.asarray(s.betas, dtype=np.float64)
    # tables are float64-derived but stored f32; recomputing the cumprod
    # from the rounded betas costs ~1e-5 rel on the tiny final alpha-bar
    np.testing.assert_allclose(acp, np.cumprod(1 - betas), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2 + np.asarray(s.sqrt_alphas_cumprod) ** 2,
        1.0, rtol=1e-5,
    )
    # rescale_timesteps=True, T=3 -> model sees {0, 333.33, 666.67}
    np.testing.assert_allclose(
        np.asarray(s.model_timesteps), [0.0, 1000.0 / 3, 2000.0 / 3], rtol=1e-5
    )


def test_space_timesteps_grammar():
    assert space_timesteps(1000, "ddim50") == set(range(0, 1000, 20))
    assert space_timesteps(100, "10,10") >= {0, 50}
    assert len(space_timesteps(100, [25])) == 25


def test_respaced_schedule_matches_subset_alphas():
    full = make_schedule(steps=100, schedule_name="linear", respacing="")
    sub = make_schedule(steps=100, schedule_name="linear", respacing="ddim10")
    keep = sorted(space_timesteps(100, "ddim10"))
    np.testing.assert_allclose(
        np.asarray(sub.alphas_cumprod),
        np.asarray(full.alphas_cumprod)[keep],
        rtol=1e-5,
    )


def test_q_sample_interpolates():
    s = make_schedule(steps=3)
    x0 = jnp.ones((2, 4, 4, 2))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 2])
    out = np.asarray(G.q_sample(s, x0, t, noise))
    sac = np.asarray(s.sqrt_alphas_cumprod)
    np.testing.assert_allclose(out[0], sac[0], rtol=1e-5)
    np.testing.assert_allclose(out[1], sac[2], rtol=1e-5)


def test_ddim_eta0_exact_recovery_when_x0_correct():
    """If the model predicts the true x0 from x_t = q_sample(x0, t, eps),
    the derived eps equals the true eps, and stepping to t=0 with
    alpha_bar_prev=1 returns exactly x0."""
    s = make_schedule(steps=3)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    t = jnp.array([0, 0])
    xt = G.q_sample(s, x0, t, eps)
    eps_derived = G.predict_eps_from_xstart(s, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_derived), np.asarray(eps), rtol=2e-3, atol=2e-3)
    step = G.ddim_step(s, xt, t, x0, eta=0.0)
    np.testing.assert_allclose(np.asarray(step.sample), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_xstart_eps_roundtrip():
    s = make_schedule(steps=1000, schedule_name="linear")
    rng = np.random.RandomState(1)
    xt = jnp.asarray(rng.randn(3, 4, 4, 2).astype(np.float32))
    eps = jnp.asarray(rng.randn(3, 4, 4, 2).astype(np.float32))
    t = jnp.array([1, 500, 999])
    x0 = G.predict_xstart_from_eps(s, xt, t, eps)
    eps2 = G.predict_eps_from_xstart(s, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), rtol=1e-3, atol=1e-3)
