"""Train-step semantics on CPU (tiny config), including the sharded
multi-device path on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvd_tpu.config import default_config
from dvd_tpu.diffusion.schedule import make_schedule
from dvd_tpu.models.dit import DiT
from dvd_tpu.training.train_state import (create_train_state, make_optimizer,
                                          make_train_step)

S, SRC = 16, 128


def _setup(time_variant=True, **train_over):
    cfg = default_config().replace(
        model={"image_size": S, "source_size": SRC, "perception_size": 64,
               "compute_dtype": "float32", "time_variant": time_variant,
               "iter": time_variant},
        train=train_over,
    )
    dit = DiT(input_size=S, patch_size=2, in_channels=2, hidden_size=48,
              depth=2, num_heads=3, tv=time_variant, chain_blocks=False)
    sched = make_schedule(steps=3)
    d = dict(
        x=jnp.zeros((1, S, S, 2)), t=jnp.zeros((1,)),
        y512=jnp.zeros((1, SRC, SRC, 3)), mask_cat=jnp.zeros((1, SRC, SRC, 1)),
        mask_y512=jnp.zeros((1, S, S, 384)), line_msk=jnp.zeros((1, S, S, 64)),
        init_flow=jnp.zeros((1, S, S, 2)), init_feat=jnp.zeros((1, S, S, 256)),
    )
    variables = dit.init(jax.random.PRNGKey(0), d["x"], d["t"],
                         y512=d["y512"], mask_cat=d["mask_cat"],
                         mask_y512=d["mask_y512"], line_msk=d["line_msk"],
                         init_flow=d["init_flow"], init_feat=d["init_feat"])
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, sched, dit.apply, tx)
    return cfg, state, step


def _batch(b=2):
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    return {
        "y512": jax.random.uniform(ks[0], (b, SRC, SRC, 3)),
        "mask_cat": jnp.ones((b, SRC, SRC, 1)),
        "mask_y512": 0.1 * jax.random.normal(ks[1], (b, S, S, 384)),
        "line_msk": 0.1 * jax.random.normal(ks[2], (b, S, S, 64)),
        "flow64": 0.05 * jax.random.normal(ks[3], (b, S, S, 2)),
        "flow_inter": jnp.zeros((b, SRC, SRC, 2)),
        "mask": jnp.ones((b, SRC, SRC, 1)),
    }


def test_train_step_updates_params_and_ema():
    cfg, state, step = _setup()
    state2, metrics = jax.jit(step)(state, _batch(), jax.random.PRNGKey(0))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"])) and float(metrics["loss"]) > 0
    # some parameter must move (final layer gets gradient even at zero init)
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.params, state2.params),
    )
    assert diff > 0
    # EMA moves 1e-4 of the way
    ema_diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.ema_params[0], state2.ema_params[0]),
    )
    assert 0 < ema_diff < diff


@pytest.mark.slow
def test_loss_decreases_over_steps():
    # each step redraws (t, noise) -> compare averaged early vs late loss
    # (real-hardware convergence evidence lives in docs/TRAIN_BENCH_r2.json)
    cfg, state, step = _setup(time_variant=False)
    batch = _batch()
    jstep = jax.jit(step)
    losses = []
    for i in range(30):
        state, m = jstep(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 1.02, (early, late, losses)


@pytest.mark.slow
def test_train_step_sharded_over_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dvd_tpu.parallel.mesh import make_mesh, sharding_tree

    cfg, state, step = _setup()
    mesh = make_mesh(data=4, model=2)
    with mesh:
        psh = sharding_tree(state.params, mesh)
        state.params = jax.tree.map(jax.device_put, state.params, psh)
        state.ema_params = tuple(
            jax.tree.map(jax.device_put, e, psh) for e in state.ema_params)
        bsh = NamedSharding(mesh, P("data"))
        batch = {k: jax.device_put(v, bsh) for k, v in _batch(8).items()}
        state2, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1


@pytest.mark.slow
def test_train_step_microbatched():
    """Gradient accumulation (cfg.train.microbatch, reference
    train_util.py:370-375): batch 4 with microbatch 2 must run as a
    lax.scan and produce a valid finite update."""
    cfg, state, step = _setup(time_variant=False)
    cfg = cfg.replace(train={"microbatch": 2})
    from dvd_tpu.diffusion.schedule import make_schedule
    from dvd_tpu.models.dit import DiT
    from dvd_tpu.training.train_state import make_optimizer, make_train_step

    dit = DiT(input_size=S, patch_size=2, in_channels=2, hidden_size=48,
              depth=2, num_heads=3, tv=False, chain_blocks=False)
    tx = make_optimizer(cfg)
    step_mb = make_train_step(cfg, make_schedule(steps=3), dit.apply, tx)

    state2, metrics = jax.jit(step_mb)(state, _batch(4), jax.random.PRNGKey(0))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"])) and float(metrics["loss"]) > 0
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, state2.params)
    assert max(jax.tree.leaves(moved)) > 0


@pytest.mark.slow
def test_per_sample_metrics_shapes_and_consistency():
    """Metrics expose per-sample t / loss / mse vectors (reference
    log_loss_dict consumes per-sample pairs, train_util.py:680-688)."""
    cfg, state, step = _setup(time_variant=False)
    b = 4
    state2, m = jax.jit(step)(state, _batch(b), jax.random.PRNGKey(3))
    assert m["t"].shape == (b,)
    assert m["loss_per_sample"].shape == (b,)
    assert m["mse_per_sample"].shape == (b,)
    # with all-ones masks, the reference scalar sum/sum equals the mean of
    # the per-sample decomposition
    np.testing.assert_allclose(float(jnp.mean(m["mse_per_sample"])),
                               float(m["mse"]), rtol=1e-5)
    # uniform sampler: weights are 1 -> weighted per-sample loss is the
    # scalar loss broadcast
    np.testing.assert_allclose(np.asarray(m["loss_per_sample"]),
                               np.full(b, float(m["loss"])), rtol=1e-5)


def test_quartile_keys_differ_across_mixed_t(tmp_path):
    """A batch with mixed timesteps must populate *different* quartile
    keys with each sample's own value."""
    from dvd_tpu.utils.logger import KVLogger, log_loss_quartiles

    logger = KVLogger(str(tmp_path))
    t = np.array([0, 1, 2, 2])
    per_sample = np.array([1.0, 2.0, 3.0, 5.0])
    log_loss_quartiles(logger, 3, t, {"loss": per_sample})
    kv = logger.dumpkvs()
    assert kv["loss_q0"] == 1.0        # t=0 -> quartile 0
    assert kv["loss_q1"] == 2.0        # t=1 -> quartile 4*1//3 = 1
    assert kv["loss_q2"] == 4.0        # two t=2 samples averaged
    assert kv["loss"] == pytest.approx(per_sample.mean())


def test_loss_aware_sampler_warmup_to_importance():
    """Uniform during warmup; importance-weighted (with compensating
    1/(T p) weights) once every timestep has a full history (reference
    resample.py:108-154)."""
    from dvd_tpu.training import resample

    T, H = 3, 10
    st = resample.LossSecondMomentState.create(T, history_per_term=H)
    key = jax.random.PRNGKey(0)

    t0, w0 = resample.loss_aware_sample(key, 6, st)
    np.testing.assert_allclose(np.asarray(w0), np.ones(6), rtol=1e-6)

    # warm the history: timestep 2 sees 10x the loss of 0/1
    for i in range(H):
        st = resample.update_history(
            st, jnp.array([0, 1, 2]), jnp.array([0.1, 0.1, 1.0]))
    p = np.asarray(resample.loss_aware_weights(st))
    assert p[2] > p[0] * 5  # importance concentrates on the lossy timestep
    t1, w1 = resample.loss_aware_sample(key, 2048, st)
    assert np.asarray(w1).std() > 0  # non-trivial compensating weights
    # E_p[w * f(t)] stays unbiased: weights are 1/(T p_t)
    np.testing.assert_allclose(
        np.asarray(w1) * p[np.asarray(t1)] * T, np.ones(2048), rtol=1e-5)
    # lossy timestep oversampled
    frac2 = float(np.mean(np.asarray(t1) == 2))
    assert frac2 > 0.5


@pytest.mark.slow
def test_train_step_updates_sampler_history_per_sample():
    cfg, state, step = _setup(time_variant=False)
    cfg = cfg.replace(train={"schedule_sampler": "loss-second-moment"})
    from dvd_tpu.diffusion.schedule import make_schedule
    from dvd_tpu.models.dit import DiT
    from dvd_tpu.training.train_state import (create_train_state,
                                              make_optimizer, make_train_step)

    dit = DiT(input_size=S, patch_size=2, in_channels=2, hidden_size=48,
              depth=2, num_heads=3, tv=False, chain_blocks=False)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, {"params": state.params,
                                     "batch_stats": state.batch_stats}, tx)
    assert state.sampler_state is not None
    step2 = make_train_step(cfg, make_schedule(steps=3), dit.apply, tx)
    b = 4
    state2, m = jax.jit(step2)(state, _batch(b), jax.random.PRNGKey(5))
    # every sample contributed one history entry at its own timestep
    assert int(state2.sampler_state.counts.sum()) == b
    hist = np.asarray(state2.sampler_state.history)
    nonzero = hist[hist != 0]
    assert nonzero.size == b
    # history entries are the per-sample (unweighted) losses
    np.testing.assert_allclose(np.sort(nonzero),
                               np.sort(np.asarray(m["mse_per_sample"])),
                               rtol=1e-6)


@pytest.mark.slow
def test_multi_rate_ema():
    # reference supports comma-separated EMA rates with one param copy per
    # rate (train_util.py:76-80); slower rate must move less per step
    cfg, state, step = _setup(time_variant=False, ema_rate="0.9,0.999")
    assert cfg.train.ema_rates == (0.9, 0.999)
    assert isinstance(state.ema_params, tuple) and len(state.ema_params) == 2
    state2, _ = jax.jit(step)(state, _batch(), jax.random.PRNGKey(0))

    def total_move(old, new):
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), old, new))

    move_fast = total_move(state.ema_params[0], state2.ema_params[0])
    move_slow = total_move(state.ema_params[1], state2.ema_params[1])
    assert move_fast > move_slow > 0
    # rate 0.9 moves 100x further than 0.999 per step
    np.testing.assert_allclose(move_fast / move_slow, 100.0, rtol=1e-3)


def test_pyramid_hoist_bit_parity():
    """The train step's conditioning-pyramid hoist (train_state.loss_fn:
    compute once, feed all three model calls via the src_feat bypass) must
    be bit-identical to the unhoisted per-call pyramid.  Run eagerly so
    both variants execute identical primitive sequences (under jit the
    fusion boundaries differ and could legally change rounding)."""
    from dvd_tpu.diffusion import losses as L
    from dvd_tpu.models.dit import conditioning_pyramid_features

    dit = DiT(input_size=S, patch_size=2, in_channels=2, hidden_size=48,
              depth=2, num_heads=3, tv=True, chain_blocks=False)
    b = 2
    batch = _batch(b)
    variables = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 2)), jnp.zeros((1,)),
        y512=batch["y512"][:1], mask_cat=batch["mask_cat"][:1],
        mask_y512=batch["mask_y512"][:1], line_msk=batch["line_msk"][:1],
        init_flow=jnp.zeros((1, S, S, 2)),
        init_feat=jnp.zeros((1, S, S, 256)))
    sched = make_schedule(steps=3)

    def model_fn(x, tt, cond, *, init_flow, init_feat, seed_init_feat,
                 remap_timesteps):
        out, _ = dit.apply(
            variables, x, tt,
            y512=cond["y512"], mask_cat=cond.get("mask_cat"),
            mask_y512=cond["mask_y512"], line_msk=cond["line_msk"],
            src_feat=cond.get("src_feat"),
            init_flow=init_flow, init_feat=init_feat,
            seed_init_feat=seed_init_feat,
            remap_timesteps=remap_timesteps,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)})
        return out

    cond = {k: batch[k] for k in ("y512", "mask_cat", "mask_y512",
                                  "line_msk")}
    t = jnp.array([0, 2], jnp.int32)   # one rollout-selected, one seeded
    rng = jax.random.PRNGKey(3)
    z2 = jnp.zeros((b, S, S, 2))
    z256 = jnp.zeros((b, S, S, 256))
    args = (z2, z256, batch["flow64"], batch["flow_inter"], batch["mask"],
            t, rng)

    plain = L.time_variant_loss(model_fn, sched, cond, *args)

    feat = conditioning_pyramid_features(
        variables["params"]["pyramid"], batch["y512"], batch["mask_cat"],
        S, dit.dtype)
    hoisted = L.time_variant_loss(
        model_fn, sched, {**cond, "src_feat": feat}, *args)

    assert float(jnp.abs(plain["loss"] - hoisted["loss"])) == 0.0
    np.testing.assert_array_equal(np.asarray(plain["mse_per"]),
                                  np.asarray(hoisted["mse_per"]))
