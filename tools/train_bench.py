#!/usr/bin/env python
"""Training-throughput benchmark on real hardware (VERDICT r1 item 5).

Measures, on the production DiT config over synthetic Doc3D-format data:

1. steady-state training steps/sec + samples/sec (full path: loader ->
   aux-net conditioning -> time-variant train step), with the loss curve
   recorded so convergence is evidenced, and
2. the rollout A/B: the vectorized batch rollout (production,
   ``sampler.rollout_states_for_training``) vs the reference's
   per-sample structure (a Python loop of single-sample jitted rollout
   calls, ``gaussian_diffusion.py:921-972``) at the same batch size.

Writes ``docs/TRAIN_BENCH_r2.json``.  Run:
  python tools/train_bench.py [--steps 200] [--batch 8] [--out PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rollout_ab(cfg, sched, pipe, batch, rng):
    """Wall-time one vectorized batched rollout vs B sequential
    single-sample rollouts (the reference's loop structure)."""
    import jax
    import jax.numpy as jnp

    from dvd_tpu.diffusion.sampler import rollout_states_for_training

    s = cfg.model.image_size
    b = batch["flow64"].shape[0]

    def make_model_fn(variables):
        # ``variables`` stays a traced jit argument — closing over the
        # concrete arrays would bake the weights into the HLO as literal
        # constants and blow the remote-compile request limit
        def model_fn(x, tt, cond, *, init_flow, init_feat, seed_init_feat,
                     remap_timesteps):
            out, _ = pipe.dit.apply(
                variables, x, tt,
                y512=cond["y512"], mask_cat=cond.get("mask_cat"),
                mask_y512=cond["mask_y512"], line_msk=cond["line_msk"],
                init_flow=init_flow, init_feat=init_feat,
                seed_init_feat=seed_init_feat,
                remap_timesteps=remap_timesteps,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return out
        return model_fn

    dit_vars = {"params": pipe.dit_vars["params"],
                "batch_stats": pipe.dit_vars.get("batch_stats", {})}
    cond = {k: batch[k] for k in ("y512", "mask_cat", "mask_y512", "line_msk")}

    def batched(variables, cnd, t, rng):
        return rollout_states_for_training(
            make_model_fn(variables), sched, cnd,
            jnp.zeros((t.shape[0], s, s, 2)),
            jnp.zeros((t.shape[0], s, s, 256)),
            t, rng=rng, latent_size=s)

    jb = jax.jit(batched)
    t_all = jnp.full((b,), 0, jnp.int32)

    # warm both compiles (batch-b and batch-1 shapes); completion via a
    # fused-scalar readback (block_until_ready can return with executions
    # in flight through the remote tunnel — see utils/bench_timing.py)
    from dvd_tpu.utils.bench_timing import make_fuse

    fuse = make_fuse()
    cond1 = {k: v[:1] for k, v in cond.items()}
    float(fuse(jb(dit_vars, cond, t_all, rng)))
    # warm the b-list fuse structure too (jit caches by pytree structure)
    float(fuse([jb(dit_vars, cond1, t_all[:1], rng)] * b))

    # interleave the two modes and take per-rep medians: the tunnel's
    # wall-clock drifts +-30% over minutes, which flipped an earlier
    # back-to-back A/B — interleaving decorrelates the drift from the mode
    reps = 5
    tbs, tss = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        out = jb(dit_vars, cond, t_all, jax.random.fold_in(rng, r))
        float(fuse(out))
        tbs.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        outs = []
        for i in range(b):  # the reference's per-sample Python loop shape
            ci = {k: v[i:i + 1] for k, v in cond.items()}
            outs.append(jb(dit_vars, ci, t_all[i:i + 1],
                           jax.random.fold_in(rng, 100 + r * b + i)))
        float(fuse(outs))
        tss.append(time.perf_counter() - t0)
    tb = sorted(tbs)[reps // 2]
    ts = sorted(tss)[reps // 2]
    return {"batched_rollout_s": tb, "per_sample_rollout_s": ts,
            "batched_reps_s": tbs, "per_sample_reps_s": tss,
            "speedup": ts / tb, "batch": b}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--out", default="docs/TRAIN_BENCH_r2.json")
    ap.add_argument("--skip_ab", action="store_true")
    ap.add_argument("--on_device_aug", action="store_true",
                    help="run the 512^2 intermediate warp + color jitter "
                         "on-device (data/device_aug.py) instead of in "
                         "loader workers — measures the loader-bound "
                         "wall-clock win")
    ap.add_argument("--sweep", type=int, nargs="*", default=None,
                    metavar="B",
                    help="device-side batch-scaling sweep: after the main "
                         "phase, rerun the device-resident chained steps "
                         "at each batch size B (VERDICT r4 item 6)")
    ap.add_argument("--sweep_microbatch", type=int, nargs="*", default=None,
                    metavar="MB",
                    help="extra sweep rows: largest --sweep batch with "
                         "grad accumulation at microbatch MB")
    args = ap.parse_args()

    import jax
    import numpy as np

    from dvd_tpu.config import default_config
    from dvd_tpu.data.doc3d import Doc3DDataset, make_doc3d_sample_list
    from dvd_tpu.data.loader import PrefetchLoader
    from dvd_tpu.data.synthetic import write_synthetic_doc3d
    from dvd_tpu.diffusion.schedule import make_schedule
    from dvd_tpu.evaluation.pipeline import DewarpPipeline
    from dvd_tpu.utils import runtime

    runtime.enable_compilation_cache()
    cfg = default_config().replace(
        train={"batch_size": args.batch, "log_interval": 10,
               "save_interval": 10**9})
    root = "checkpoints/synthetic_doc3d"
    write_synthetic_doc3d(root, args.n_samples)
    cfg = cfg.replace(data={"data_root": root})

    samples = make_doc3d_sample_list(root, split_ratio=1.0)
    ds = Doc3DDataset(samples=samples, device_aug=args.on_device_aug)
    keys = (("image512", "doc_mask512", "flow_map") if args.on_device_aug
            else ("source_image", "doc_mask", "flow_map", "flow_map_inter"))
    loader = PrefetchLoader(ds, batch_size=args.batch, num_workers=2, seed=0,
                            keys=keys)

    # --- full train path with instrumentation ---------------------------
    from dvd_tpu.training import train_loop as TL
    from dvd_tpu.training.checkpoint import maybe_load_pipeline_weights
    from dvd_tpu.training.train_state import (create_train_state,
                                              make_optimizer, make_train_step)
    from dvd_tpu.parallel.mesh import make_mesh, sharding_tree
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(cfg.parallel.data_axis, cfg.parallel.model_axis)
    latent = cfg.model.image_size
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(0))
    maybe_load_pipeline_weights(pipe, cfg)
    sched = make_schedule(steps=cfg.diffusion.diffusion_steps,
                          schedule_name=cfg.diffusion.noise_schedule,
                          respacing=cfg.diffusion.timestep_respacing,
                          rescale_timesteps=cfg.diffusion.rescale_timesteps)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, pipe.dit_vars, tx)
    train_step = make_train_step(cfg, sched, pipe.dit.apply, tx)

    losses, times = [], []
    with mesh:
        psh = sharding_tree(state.params, mesh, cfg.parallel.fsdp)
        state.params = jax.tree.map(jax.device_put, state.params, psh)
        state.ema_params = tuple(
            jax.tree.map(jax.device_put, e, psh) for e in state.ema_params)
        batch_sh = NamedSharding(mesh, P("data"))
        if args.on_device_aug:
            from dvd_tpu.data.device_aug import augment_batch

            frac = cfg.data.inter_t / cfg.data.inter_T
            aug_rng = jax.random.PRNGKey(0x5EED)

            def _prep(aux, raw, key):
                return TL.build_device_batch(
                    pipe, aux, augment_batch(raw, key, inter_frac=frac),
                    latent)

            import itertools

            _prep_jit = jax.jit(_prep)
            _ctr = itertools.count()

            def prep_jit(aux, raw):
                return _prep_jit(aux, raw,
                                 jax.random.fold_in(aug_rng, next(_ctr)))
        else:
            prep_jit = jax.jit(
                lambda aux, raw: TL.build_device_batch(pipe, aux, raw, latent))
        step_fn = jax.jit(train_step, donate_argnums=(0,))
        rng = jax.random.PRNGKey(0)

        it = iter(loader)
        ab = None
        if not args.skip_ab:
            # before the train loop: the first donated step frees the
            # original param buffers that rollout_ab reads via pipe.dit_vars
            raw0 = {k: jax.device_put(jax.numpy.asarray(v), batch_sh)
                    for k, v in next(it).items()}
            batch0 = prep_jit(TL.train_aux_vars(pipe), raw0)
            ab = rollout_ab(cfg, sched, pipe, batch0, rng)
            print("rollout A/B:", ab, flush=True)
        t_wall0 = time.perf_counter()
        resident = []          # last few prepped (device-side) batches
        for i in range(args.steps):
            raw = next(it)
            raw = {k: jax.device_put(jax.numpy.asarray(v), batch_sh)
                   for k, v in raw.items()}
            t0 = time.perf_counter()
            batch = prep_jit(TL.train_aux_vars(pipe), raw)
            state, metrics = step_fn(state, batch, rng)
            loss = float(metrics["loss"])  # sync point
            dt = time.perf_counter() - t0
            losses.append(loss)
            times.append(dt)
            resident.append(raw)
            if len(resident) > 8:
                resident.pop(0)
            if i % 10 == 0:
                print(f"step {i}: loss={loss:.5f} {dt*1000:.0f} ms", flush=True)

        t_wall = time.perf_counter() - t_wall0

        # --- device-resident steady state ------------------------------
        # The streamed loop above syncs the host on every step (loss
        # readback) and streams ~65 MB of raw batch per step, so through
        # the remote-TPU tunnel (~27 ms scalar RTT, ~20 MB/s measured
        # 2026-08-19) its number is transfer/RTT-bound, not compute-bound.
        # Real TPU hosts feed over local PCIe.  This phase isolates the
        # device-side cost the way the production loop actually runs
        # (bcf5b48 removed per-step syncs): RAW batches pre-staged in HBM,
        # per-step conditioning prep + donated train step chained with NO
        # host readback until one final loss read that transitively
        # depends on every step (prep_i -> step_i -> state_{i+1}).
        dev_steps = min(args.steps, 100)
        aux = TL.train_aux_vars(pipe)
        for b in resident:    # force transfers outside the timed window
            jax.block_until_ready(b)
        t0 = time.perf_counter()
        for i in range(dev_steps):
            batch = prep_jit(aux, resident[i % len(resident)])
            state, metrics = step_fn(state, batch, rng)
        float(metrics["loss"])   # chain sync
        dev_dt = time.perf_counter() - t0

        # --- device-side batch-scaling sweep (VERDICT r4 item 6) -------
        # Same chained prep+step protocol as above, at each requested
        # batch (raw batches built by tiling the resident pool, staged in
        # HBM before the timed window).  Optionally repeats the largest
        # batch with gradient accumulation (train.microbatch) — the
        # memory-equivalent alternative to just raising the batch.
        import jax.numpy as jnp

        def timed_chain(step, prep, raw_b, n=30):
            b0 = prep(aux, raw_b)       # warm both compiles
            st, m = step(state_sw[0], b0, rng)
            state_sw[0] = st
            float(m["loss"])
            t0 = time.perf_counter()
            for i in range(n):
                bb = prep(aux, raw_b)
                st, m = step(state_sw[0], bb, rng)
                state_sw[0] = st
            float(m["loss"])
            return (time.perf_counter() - t0) / n

        sweep_rows = []
        if args.sweep:
            state_sw = [state]
            # host snapshot: a failed (OOM) row leaves the donated state
            # buffers invalidated — restore so later rows still run
            state_host = jax.device_get(state)

            def _restore():
                state_sw[0] = jax.tree.map(
                    lambda x: jax.device_put(jnp.asarray(x)), state_host)
            for b in args.sweep:
                factor = (b + args.batch - 1) // args.batch
                raw_b = {k: jnp.concatenate(
                    [resident[i % len(resident)][k] for i in range(factor)]
                )[:b] for k in resident[0]}
                raw_b = {k: jax.device_put(v, batch_sh)
                         for k, v in raw_b.items()}
                jax.block_until_ready(raw_b)
                try:
                    dt = timed_chain(step_fn, prep_jit, raw_b)
                except Exception as e:  # noqa: BLE001 — isolate OOM rows
                    sweep_rows.append({"batch": b, "microbatch": -1,
                                       "error": repr(e)[:200]})
                    print(f"sweep batch {b} failed: {e!r}", flush=True)
                    _restore()
                    continue
                row = {"batch": b, "microbatch": -1,
                       "ms_per_step": round(dt * 1e3, 1),
                       "device_steps_per_sec": round(1.0 / dt, 3),
                       "device_samples_per_sec": round(b / dt, 2)}
                sweep_rows.append(row)
                print("sweep:", row, flush=True)
            for mb in (args.sweep_microbatch or []):
                b = max(args.sweep)
                cfg_mb = cfg.replace(train={"microbatch": mb})
                step_mb = jax.jit(
                    make_train_step(cfg_mb, sched, pipe.dit.apply, tx),
                    donate_argnums=(0,))
                factor = (b + args.batch - 1) // args.batch
                raw_b = {k: jnp.concatenate(
                    [resident[i % len(resident)][k] for i in range(factor)]
                )[:b] for k in resident[0]}
                raw_b = {k: jax.device_put(v, batch_sh)
                         for k, v in raw_b.items()}
                jax.block_until_ready(raw_b)
                try:
                    dt = timed_chain(step_mb, prep_jit, raw_b)
                except Exception as e:  # noqa: BLE001
                    sweep_rows.append({"batch": b, "microbatch": mb,
                                       "error": repr(e)[:200]})
                    print(f"sweep mb {mb} failed: {e!r}", flush=True)
                    _restore()
                    continue
                row = {"batch": b, "microbatch": mb,
                       "ms_per_step": round(dt * 1e3, 1),
                       "device_steps_per_sec": round(1.0 / dt, 3),
                       "device_samples_per_sec": round(b / dt, 2)}
                sweep_rows.append(row)
                print("sweep:", row, flush=True)
            state = state_sw[0]
    steady = times[max(1, len(times) // 5):]
    result = {
        "device": str(jax.devices()[0]),
        "batch": args.batch,
        "steps": args.steps,
        "on_device_aug": bool(args.on_device_aug),
        # device-resident chained steps (raw batches pre-staged in HBM,
        # zero host syncs inside the window) — the TPU compute number,
        # comparable across rounds/hosts
        "device_steps_per_sec": dev_steps / dev_dt,
        "device_samples_per_sec": args.batch * dev_steps / dev_dt,
        # per-step (conditioning prep + train step + loss readback),
        # loader excluded but host<->device transfer + RTT included —
        # tunnel-bound in this environment (see comment above)
        "steps_per_sec": 1.0 / float(np.mean(steady)),
        "samples_per_sec": args.batch / float(np.mean(steady)),
        # end-to-end incl. the Python loader (1 CPU core in this env);
        # includes the step-0 compile unless steps is large
        "wall_steps_per_sec": args.steps / t_wall,
        "loss_first10_mean": float(np.mean(losses[:10])),
        "loss_last10_mean": float(np.mean(losses[-10:])),
        "loss_curve_every10": losses[::10],
        "rollout_ab": ab,
        "sweep_rows": sweep_rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "loss_curve_every10"}, indent=2))


if __name__ == "__main__":
    main()
