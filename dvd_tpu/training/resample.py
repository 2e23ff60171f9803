"""Timestep schedule samplers (reference ``resample.py:8-154``).

- uniform: equal probability over compact timesteps (production,
  ``local.py:48``)
- loss-second-moment: importance sampling from a running per-timestep
  sqrt-second-moment of the loss; uniform until ``history_per_term``
  observations per term exist.  The reference syncs losses across ranks
  with all_gather; here the history update takes the (already psum-ed /
  gathered) per-sample losses, and the state is a pure pytree so it
  shards/replicates naturally.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def uniform_sample(rng: jax.Array, batch: int, num_timesteps: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,), jnp.float32)
    return t, weights


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LossSecondMomentState:
    history: jnp.ndarray        # (T, history_per_term)
    counts: jnp.ndarray         # (T,) int32

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10):
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def loss_aware_weights(state: LossSecondMomentState,
                       uniform_prob: float = 0.001) -> jnp.ndarray:
    """Per-timestep sampling probabilities."""
    T, H = state.history.shape
    warmed = jnp.all(state.counts >= H)
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1 - uniform_prob) + uniform_prob / T
    uniform = jnp.full((T,), 1.0 / T)
    return jnp.where(warmed, w, uniform)


def loss_aware_sample(rng: jax.Array, batch: int,
                      state: LossSecondMomentState
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p = loss_aware_weights(state)
    t = jax.random.choice(rng, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def update_history(state: LossSecondMomentState, t: jnp.ndarray,
                   losses: jnp.ndarray) -> LossSecondMomentState:
    """Append per-sample losses into each timestep's FIFO ring."""

    def body(carry, xi):
        hist, counts = carry
        ti, li = xi
        h = counts[ti] % hist.shape[1]
        hist = hist.at[ti, h].set(li)
        counts = counts.at[ti].add(1)
        return (hist, counts), None

    (hist, counts), _ = jax.lax.scan(
        body, (state.history, state.counts),
        (t.astype(jnp.int32), losses.astype(jnp.float32)),
    )
    return LossSecondMomentState(history=hist, counts=counts)
