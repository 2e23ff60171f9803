"""Shared tiny-model setup for the multi-host tests: identical in the
single-process run and in each jax.distributed child, so losses are
directly comparable."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

S, SRC, B = 16, 64, 8


def global_batch():
    r = np.random.RandomState(3)
    f = lambda *s: r.rand(*s).astype(np.float32)
    return {
        "y512": f(B, SRC, SRC, 3),
        "mask_cat": np.ones((B, SRC, SRC, 1), np.float32),
        "mask_y512": 0.1 * f(B, S, S, 384),
        "line_msk": 0.1 * f(B, S, S, 64),
        "flow64": 0.05 * (f(B, S, S, 2) - 0.5),
        "flow_inter": np.zeros((B, SRC, SRC, 2), np.float32),
        "mask": np.ones((B, SRC, SRC, 1), np.float32),
    }


def make_setup():
    from dvd_tpu.config import default_config
    from dvd_tpu.diffusion.schedule import make_schedule
    from dvd_tpu.models.dit import DiT
    from dvd_tpu.parallel.mesh import make_mesh
    from dvd_tpu.training.train_state import (create_train_state,
                                              make_optimizer, make_train_step)

    cfg = default_config().replace(
        model={"image_size": S, "source_size": SRC, "perception_size": 64,
               "compute_dtype": "float32", "time_variant": False,
               "iter": False},
    )
    dit = DiT(input_size=S, patch_size=2, in_channels=2, hidden_size=48,
              depth=2, num_heads=3, tv=False, chain_blocks=False)
    sched = make_schedule(steps=3)
    tx = make_optimizer(cfg)
    mesh = make_mesh(data=-1, model=1)

    d = dict(
        x=jnp.zeros((1, S, S, 2)), t=jnp.zeros((1,)),
        y512=jnp.zeros((1, SRC, SRC, 3)),
        mask_cat=jnp.zeros((1, SRC, SRC, 1)),
        mask_y512=jnp.zeros((1, S, S, 384)),
        line_msk=jnp.zeros((1, S, S, 64)),
        init_flow=jnp.zeros((1, S, S, 2)),
    )

    def state_fn():
        # init on device under jit with replicated output shardings so the
        # identical state exists on every host without host-side transfers
        repl = NamedSharding(mesh, P())

        def build(rng):
            variables = dit.init(
                rng, d["x"], d["t"], y512=d["y512"],
                mask_cat=d["mask_cat"], mask_y512=d["mask_y512"],
                line_msk=d["line_msk"], init_flow=d["init_flow"])
            return create_train_state(cfg, variables, tx)

        return jax.jit(build, out_shardings=repl)(jax.random.PRNGKey(0))

    step = make_train_step(cfg, sched, dit.apply, tx)
    return mesh, state_fn, jax.jit(step), cfg
