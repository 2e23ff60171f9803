"""Train state + sharded train step.

Replaces the reference's ``TrainLoop`` internals (``train_util.py:38-642``):
AdamW (``:111``), EMA at rate 0.9999 (``local.py:52``), global-norm grad
clipping at 1.0 (``:411``), linear LR anneal over ``lr_anneal_steps``
(``:583-590``), and DDP gradient averaging — which on TPU is simply the
psum XLA inserts when the step is jitted with a batch sharded over the
``data`` mesh axis and replicated parameters.

The production loss path (iter=True, time-variant) runs the vectorized
rollout from ``dvd_tpu.diffusion.sampler`` instead of the reference's
per-sample Python loop (its single biggest training-throughput sin).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dvd_tpu.config import DvDConfig
from dvd_tpu.diffusion import losses as L
from dvd_tpu.diffusion.schedule import DiffusionSchedule
from dvd_tpu.training import resample


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any             # tuple of param trees, one per EMA rate
    batch_stats: Any            # SATRN decoder BN running stats (trainable model)
    sampler_state: Optional[resample.LossSecondMomentState]


def make_optimizer(cfg: DvDConfig) -> optax.GradientTransformation:
    lr = cfg.train.lr
    if cfg.train.lr_anneal_steps:
        # reference _anneal_lr: lr * (1 - step/anneal_steps) (train_util.py:583)
        schedule = lambda step: lr * jnp.maximum(
            0.0, 1.0 - step / cfg.train.lr_anneal_steps
        )
    else:
        schedule = lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.train.weight_decay),
    )


def create_train_state(cfg: DvDConfig, variables: Dict[str, Any],
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    tx = tx or make_optimizer(cfg)
    params = variables["params"]
    sampler_state = None
    if cfg.train.schedule_sampler == "loss-second-moment":
        sampler_state = resample.LossSecondMomentState.create(
            cfg.diffusion.diffusion_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=tuple(jax.tree.map(jnp.copy, params)
                         for _ in cfg.train.ema_rates),
        batch_stats=variables.get("batch_stats", {}),
        sampler_state=sampler_state,
    )


def make_train_step(
    cfg: DvDConfig,
    sched: DiffusionSchedule,
    dit_apply: Callable,          # flax Module.apply of the denoiser
    tx: optax.GradientTransformation,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    ``batch`` (all device arrays, NHWC):
      y512        (B, 512, 512, 3)  source image [0,1]
      mask_cat    (B, 512, 512, 1)  doc mask
      mask_y512   (B, S, S, 384)    seg pyramid conditioning
      line_msk    (B, S, S, 64)     text-line conditioning
      flow64      (B, S, S, 2)      GT offsets at latent res
      flow_inter  (B, 512, 512, 2)  intermediate offsets
      mask        (B, 512, 512, 1)  loss mask
    """
    if cfg.model.quantize != "none":
        # QDense is a serving-only path: jnp.round has zero gradient a.e.,
        # so training through it would silently freeze the quantized
        # matmuls (ops/quant.py documents the invariant)
        raise ValueError(
            f"model.quantize={cfg.model.quantize!r} cannot be trained "
            "through; set quantize='none' for training")
    from dvd_tpu.models.registry import check_driver_mode, is_dit_mode

    check_driver_mode(cfg.model.train_mode)
    ema_rates = cfg.train.ema_rates
    s = cfg.model.image_size
    is_dit = is_dit_mode(cfg.model.train_mode)
    use_tv = bool(cfg.model.time_variant) and cfg.model.iter and is_dit
    # the pyramid hoist only applies to the production DiT (which has the
    # src_feat bypass); alternative denoisers take cond dicts without it
    hoist_pyramid = is_dit and cfg.model.train_VGG
    model_dtype = jnp.dtype(cfg.model.compute_dtype)

    def alt_loss_fn(params, batch_stats, batch, t, rng):
        """Alternative denoiser families (stage_1 / stage_1_transformer /
        stage_1_doctr): the reference's non-iter, non-DiT dispatch routes
        through the plain masked MSE (train_util.py:350-366 with
        ``training_losses``, gaussian_diffusion.py:1062-1102); the model
        takes (x, t, src_feat, init_flow) with SpacedDiffusion-rescaled
        timesteps (applied inside plain_masked_mse via G.model_t)."""
        del batch_stats   # alt families carry no BN running stats

        def model_fn(x, tt, cond, **kw):
            out = dit_apply({"params": params}, x, tt,
                            src_feat=cond["src_feat"],
                            init_flow=kw["init_flow"])
            return out[0] if isinstance(out, tuple) else out

        b = batch["flow64"].shape[0]
        terms = L.plain_masked_mse(
            model_fn, sched, {"src_feat": batch["src_feat"]},
            batch["flow64"], batch["mask"], t, rng,
            init_flow=jnp.zeros((b, s, s, 2), jnp.float32))
        return terms["loss"], (terms, {})

    def loss_fn(params, batch_stats, batch, t, rng):
        mutable_bs = {}

        def model_fn(x, tt, cond, *, init_flow, init_feat, seed_init_feat,
                     remap_timesteps):
            out, new_state = dit_apply(
                {"params": params, "batch_stats": batch_stats},
                x, tt,
                y512=cond["y512"], mask_cat=cond.get("mask_cat"),
                mask_y512=cond.get("mask_y512"),
                line_msk=cond.get("line_msk"),
                src_feat=cond.get("src_feat"),
                init_flow=init_flow, init_feat=init_feat,
                seed_init_feat=seed_init_feat,
                remap_timesteps=remap_timesteps,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
            mutable_bs.update(new_state.get("batch_stats", {}))
            return out

        # conditioning streams mirror the reference's flag handling
        # (train_util.py:318-328): mask_y512/line_msk/src_feat are present
        # in the batch only per use_gt_mask/use_line_mask/train_VGG — see
        # train_loop.build_device_batch
        cond = {k: batch[k]
                for k in ("y512", "mask_cat", "mask_y512", "line_msk",
                          "src_feat") if k in batch}
        if hoist_pyramid:
            # compute the DiT's private conditioning pyramid ONCE per step
            # and feed it through the src_feat bypass: its input (y512 [+
            # mask_cat]) is identical across the rollout's T-1 calls and
            # the supervised call.  Measured perf-neutral on v5e (XLA
            # already CSEs the identical subgraphs) — kept because it
            # makes the sharing a guarantee instead of a compiler
            # courtesy, and mirrors the serving-side hoist
            # (pipeline._hoist_pyramid).  Bit-identical (pure
            # conv/relu/pool — no dropout/BN) and gradient-identical: the
            # reference's rollout runs under no_grad, so pyramid grads
            # flow only through the supervised call — exactly what
            # stop_gradient'd rollout outputs give.
            from dvd_tpu.models.dit import conditioning_pyramid_features

            cond["src_feat"] = conditioning_pyramid_features(
                params["pyramid"], batch["y512"], batch.get("mask_cat"),
                s, model_dtype)
        b = batch["flow64"].shape[0]
        init_flow = jnp.zeros((b, s, s, 2), jnp.float32)
        init_feat = jnp.zeros((b, s, s, 256), jnp.float32)
        if use_tv:
            terms = L.time_variant_loss(
                model_fn, sched, cond, init_flow, init_feat,
                batch["flow64"], batch["flow_inter"], batch["mask"], t, rng,
                rollout_remap=cfg.model.remap_rollout_timesteps)
        else:
            terms = L.composed_warp_loss(
                model_fn, sched, cond, init_flow,
                init_feat if cfg.model.time_variant else None,
                batch["flow64"], batch["flow_inter"], batch["mask"], t, rng)
        return terms["loss"], (terms, mutable_bs)

    if not is_dit:
        loss_fn = alt_loss_fn   # noqa: F811 — registry train_mode dispatch

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        k_t, k_loss = jax.random.split(jax.random.fold_in(rng, state.step))
        if state.sampler_state is not None:
            t, weights = resample.loss_aware_sample(
                k_t, batch["flow64"].shape[0], state.sampler_state)
        else:
            t, weights = resample.uniform_sample(
                k_t, batch["flow64"].shape[0], sched.num_timesteps)

        mb = cfg.train.microbatch
        if mb and mb > 0 and mb < batch["flow64"].shape[0]:
            # gradient accumulation (reference microbatching,
            # train_util.py:370-375) as a lax.scan over (B/mb) chunks —
            # one compiled body, grads averaged across chunks.  Each
            # chunk's loss/grads are scaled by its sampler weights, as the
            # reference's per-microbatch `(loss * weights).mean()`
            # (train_util.py:448).
            b = batch["flow64"].shape[0]
            assert b % mb == 0, f"batch {b} not divisible by microbatch {mb}"
            k = b // mb
            chunked = jax.tree.map(
                lambda x: x.reshape((k, mb) + x.shape[1:]), batch)
            t_chunks = t.reshape(k, mb)
            w_chunks = weights.reshape(k, mb)

            def body(carry, xs):
                grads_acc, loss_acc, mse_acc = carry
                mbatch, mt, mw, i = xs
                (l, (tm, bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, state.batch_stats, mbatch, mt,
                  jax.random.fold_in(k_loss, i))
                wm = jnp.mean(mw)
                grads_acc = jax.tree.map(
                    lambda a, gi: a + gi * wm, grads_acc, g)
                ys = (l * mw, tm["mse_per"], bs)
                return (grads_acc, loss_acc + l * wm, mse_acc + tm["mse"]), ys

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, mse_sum), (lps, mps, bs_stack) = jax.lax.scan(
                body, (zero_grads, 0.0, 0.0),
                (chunked, t_chunks, w_chunks, jnp.arange(k)))
            grads = jax.tree.map(lambda g: g / k, grads)
            loss = loss / k
            terms = {"mse": mse_sum / k, "loss": loss}
            loss_per = lps.reshape(b)
            mse_per = mps.reshape(b)
            new_bs = jax.tree.map(lambda x: x[-1], bs_stack) if bs_stack \
                else {}
        else:
            (loss_u, (terms, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, t, k_loss)
            # reference `(losses["loss"] * weights).mean()` with the
            # scalar composed loss == loss * weights.mean()
            wm = jnp.mean(weights)
            grads = jax.tree.map(lambda g: g * wm, grads)
            loss = loss_u * wm
            loss_per = loss_u * weights
            mse_per = terms["mse_per"]

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = tuple(
            jax.tree.map(lambda e, p, r=rate: e * r + p * (1.0 - r),
                         ema_tree, new_params)
            for rate, ema_tree in zip(ema_rates, state.ema_params)
        )
        gnorm = optax.global_norm(grads)

        sampler_state = state.sampler_state
        if sampler_state is not None:
            # per-sample (unweighted) losses per timestep, as the
            # reference's update_with_local_losses (resample.py:71-104)
            sampler_state = resample.update_history(
                sampler_state, t, mse_per)

        metrics = {
            "loss": loss,
            "mse": terms["mse"],
            "grad_norm": gnorm,
            "t": t.astype(jnp.float32),          # (B,) per-sample
            "loss_per_sample": loss_per,         # (B,) weighted
            "mse_per_sample": mse_per,           # (B,) unweighted
        }
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            batch_stats=new_bs if new_bs else state.batch_stats,
            sampler_state=sampler_state,
        )
        return new_state, metrics

    return train_step
