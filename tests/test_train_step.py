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


def _setup(time_variant=True):
    cfg = default_config().replace(
        model={"image_size": S, "source_size": SRC, "perception_size": 64,
               "compute_dtype": "float32", "time_variant": time_variant,
               "iter": time_variant},
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
                     state.ema_params, state2.ema_params),
    )
    assert 0 < ema_diff < diff


def test_loss_decreases_over_steps():
    # each step redraws (t, noise) -> compare averaged early vs late loss
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


def test_train_step_sharded_over_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dvd_tpu.parallel.mesh import make_mesh, sharding_tree

    cfg, state, step = _setup()
    mesh = make_mesh(data=4, model=2)
    with mesh:
        psh = sharding_tree(state.params, mesh)
        state.params = jax.tree.map(jax.device_put, state.params, psh)
        state.ema_params = jax.tree.map(jax.device_put, state.ema_params, psh)
        bsh = NamedSharding(mesh, P("data"))
        batch = {k: jax.device_put(v, bsh) for k, v in _batch(8).items()}
        state2, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1


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
