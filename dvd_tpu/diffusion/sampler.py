"""Jitted DDIM sampling for the DvD coordinate diffusion.

This replaces the reference's host-side Python sampling loop
(``gaussian_diffusion.py:537-644``) with a single traced computation:

- the T-step loop is one ``lax.scan`` with a single traced copy of the
  denoiser (``unroll=True`` is available; the scan keeps the executable
  ~T-times smaller, which matters under remote-compile size limits);
- the ``n_batch`` multi-hypothesis trick becomes a pure batch dimension
  (B images x n_batch hypotheses in one model call);
- the time-variant recurrent state (init_flow <- pred_flow, init_feat <-
  re-warped features, reference ``:618-624``) is carried between steps
  on-device — the reference's per-step PNG dumping (``:596-614``, disk I/O
  inside the sampler!) is intentionally not replicated;
- hypothesis averaging + clamping (``:639-643``) happens on-device.

Also provides the *training* partial rollout (``ddim_sample_for_training``,
reference ``:694-782``) in vectorized form: instead of one Python-loop
rollout per sample, we roll the full batch forward once and select each
sample's state by its timestep — same distribution, batch-parallel.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dvd_tpu.diffusion import gaussian as G
from dvd_tpu.diffusion.schedule import DiffusionSchedule
from dvd_tpu.ops.grid_sample import warp
from dvd_tpu.utils.grids import flow_to_grid

# model_fn(x, t, cond_dict, init_flow, init_feat, seed_init_feat, remap)
#   -> (pred_x0_flow, cond_feat)
ModelFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]


def _repeat_tree(tree, n: int):
    """Tile every leaf n times along a new leading hypothesis axis folded
    into batch: (B, ...) -> (n*B, ...), hypothesis-major like the
    reference's ``repeat(n_batch, 1, 1, 1)``."""
    return jax.tree.map(
        lambda a: jnp.tile(a, (n,) + (1,) * (a.ndim - 1)), tree
    )


class SampleResult(NamedTuple):
    flow: jnp.ndarray          # (B, S, S, 2) averaged, clamped hypothesis mean
    hypotheses: jnp.ndarray    # (n_batch, B, S, S, 2) per-hypothesis x0


def ddim_sample_loop(
    model_fn: ModelFn,
    sched: DiffusionSchedule,
    cond: Dict[str, jnp.ndarray],
    init_flow: jnp.ndarray,
    init_feat: Optional[jnp.ndarray],
    *,
    rng: jax.Array,
    latent_size: int,
    n_batch: int = 2,
    time_variant: bool = True,
    eta: float = 0.0,
    clip_denoised: bool = False,
    unroll: bool = False,
    init_noise: Optional[jnp.ndarray] = None,
) -> SampleResult:
    """Full T-step DDIM inference (reference ddim_sample_loop +
    ddim_sample_loop_progressive_only_mean).

    ``init_noise``: optional (n_batch*B, S, S, 2) x_T draw, hypothesis-major
    — replaces the internal Gaussian draw (used by parity tests that must
    feed both frameworks identical noise; reference draws it internally at
    gaussian_diffusion.py:568)."""
    b = init_flow.shape[0]
    s = latent_size
    T = sched.num_timesteps

    cond_r = _repeat_tree(cond, n_batch)
    init_flow_r = _repeat_tree(init_flow, n_batch)
    init_feat_r = _repeat_tree(init_feat, n_batch) if init_feat is not None else None

    nb = n_batch * b
    rng, rng_noise = jax.random.split(rng)
    x = init_noise if init_noise is not None else \
        jax.random.normal(rng, (nb, s, s, 2), dtype=jnp.float32)

    if init_feat_r is None:
        init_feat_r = jnp.zeros((nb, s, s, 256), jnp.float32)

    # lax.scan over the T steps: the traced program contains ONE copy of
    # the denoiser (vs T under unrolling) — a 3x smaller executable, which
    # matters under remote-compile size limits and for compile latency.
    def body(carry, step_in):
        x, pred_flow, feat, fl, ft = carry
        i, first = step_in
        if time_variant:
            # recurrent conditioning update, skipped on the first step
            # (reference :618-624).  lax.cond (not where) so the feature
            # re-warp gather doesn't execute at all on the first step —
            # it used to run and be discarded (~0.7 ms/batch on v5e)
            fl, ft = jax.lax.cond(
                first,
                lambda: (fl, ft),
                lambda: (pred_flow, warp(feat, flow_to_grid(pred_flow))),
            )
        t = jnp.full((nb,), i, dtype=jnp.int32)
        pred_x0, feat_out = model_fn(
            x,
            G.model_t(sched, t),
            cond_r,
            init_flow=fl,
            init_feat=ft,
            seed_init_feat=jnp.full((nb,), first),
            remap_timesteps=True,
        )
        # eta > 0 stochastic DDIM draws fresh per-step noise exactly like
        # the reference (gaussian_diffusion.py:479); eta == 0 (the shipped
        # config) traces no noise at all
        noise = (jax.random.normal(jax.random.fold_in(rng_noise, i),
                                   x.shape, x.dtype)
                 if eta != 0.0 else None)
        step = G.ddim_step(sched, x, t, pred_x0, eta=eta, noise=noise,
                           clip_denoised=clip_denoised)
        return (step.sample, step.pred_xstart, feat_out, fl, ft), None

    steps = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    firsts = steps == (T - 1)
    carry0 = (x, init_flow_r, init_feat_r, init_flow_r, init_feat_r)
    if unroll:
        carry = carry0
        for k in range(T):
            carry, _ = body(carry, (steps[k], firsts[k]))
        (x, pred_flow, feat, _, _) = carry
    else:
        (x, pred_flow, feat, _, _), _ = jax.lax.scan(
            body, carry0, (steps, firsts))

    hyp = pred_flow.reshape(n_batch, b, s, s, 2)
    mean_flow = jnp.clip(jnp.mean(hyp, axis=0), -1.0, 1.0)
    return SampleResult(flow=mean_flow, hypotheses=hyp)


def rollout_states_for_training(
    model_fn: ModelFn,
    sched: DiffusionSchedule,
    cond: Dict[str, jnp.ndarray],
    init_flow: jnp.ndarray,
    init_feat: jnp.ndarray,
    t: jnp.ndarray,
    *,
    rng: jax.Array,
    latent_size: int,
    remap_timesteps: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized replacement for the reference's per-sample training
    rollout (``training_losses_time_variant``, gaussian_diffusion.py:921-972).

    ``remap_timesteps=False`` is the reference behavior: the rollout's
    model calls receive rescaled t (667/333) with no remap
    (``mode='train'``, gaussian_diffusion.py:731-733), unlike serving.
    True opts into serving-consistent recurrence
    (``config.ModelConfig.remap_rollout_timesteps``).

    The reference loops over the batch; for each sample with timestep
    ``t_i < T-1`` it runs a fresh DDIM rollout from T-1 down to ``t_i+1``
    (with its own noise draw) to synthesize ``init_flow``/``init_feat``.

    Equivalent batch-parallel form: run the rollout once for the whole
    batch under stop_gradient, snapshotting the recurrent state after every
    step; then select, per sample, the state corresponding to its sampled
    timestep.  Per-sample noise is drawn independently, so the conditional
    distribution of (init_flow, init_feat | t) is unchanged.

    Returns (init_flow', init_feat') ready for the main loss model call.
    """
    b = init_flow.shape[0]
    s = latent_size
    T = sched.num_timesteps

    x = jax.random.normal(rng, (b, s, s, 2), dtype=jnp.float32)

    # running per-sample selection: out_* holds the recurrent state for
    # each sample's own timestep (init state for t == T-1; a (T, B, ...)
    # stack + gather would keep T copies of the 256-ch feature map live —
    # ~300 MB at production shapes — for no benefit)
    ti = t.astype(jnp.int32)
    out_flow, out_feat = init_flow, init_feat

    cur_flow, cur_feat = init_flow, init_feat
    pred_flow, feat = init_flow, init_feat
    for i in reversed(range(1, T)):  # steps T-1 .. 1 (state for t = i-1)
        first = i == T - 1
        if not first:
            cur_flow = pred_flow
            feat = warp(feat, flow_to_grid(pred_flow))
            cur_feat = feat
        t_vec = jnp.full((b,), i, dtype=jnp.int32)
        pred_x0, feat_out = model_fn(
            x,
            G.model_t(sched, t_vec),
            cond,
            init_flow=cur_flow,
            init_feat=cur_feat,
            seed_init_feat=jnp.full((b,), first),
            remap_timesteps=remap_timesteps,
        )
        step = G.ddim_step(sched, x, t_vec, pred_x0, eta=0.0, clip_denoised=False)
        x = step.sample
        pred_flow = step.pred_xstart  # intra-rollout carry stays unclamped
        feat = feat_out

        # after completing step i, the state below is what a sample with
        # t == i-1 would receive (reference :948,:955-970: the *handed-off*
        # flow is clamped, then init_feat <- warp(feat, clamped flow))
        handoff = jnp.clip(pred_flow, -1.0, 1.0)
        sel = (ti == i - 1)[:, None, None, None]
        out_flow = jnp.where(sel, handoff, out_flow)
        out_feat = jnp.where(sel, warp(feat, flow_to_grid(handoff)), out_feat)

    return (jax.lax.stop_gradient(out_flow),
            jax.lax.stop_gradient(out_feat))
