"""Batched benchmark driver (DocUNet-130 / DIR300 / AnyPhotoDoc6300 /
DocReal).

Replaces the reference's bs=1 per-image Python loop
(``evaluation.py:142-327``) with device-batch processing:

- images stream in fixed-size padded batches (one compiled executable for
  every original resolution),
- conditioning + diffusion + unwarp run as two jitted programs,
- dewarped PNGs and coordinate maps are written with the reference's
  naming scheme ``vis_hp/{dataset}/{name}/dewarped_pred/warped_*.png``
  (``visualization_utils.py:64-91``) so downstream MATLAB/Python metric
  tooling is drop-in compatible.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvd_tpu.config import DvDConfig
from dvd_tpu.data.benchmark import BenchmarkDataset
from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_native


@functools.lru_cache(maxsize=8)
def _unwarp_jit(data_size: int, mesh):
    """One jitted unwarp per (data_size, mesh): repeated run_benchmark
    calls (corruption sweep: 75 combos; per-category protocol) must reuse
    the compiled executable instead of retracing a fresh lambda."""
    return jax.jit(lambda p, hw, f: jnp.clip(jnp.round(
        unwarp_native(p.astype(jnp.float32), hw, f,
                      batch_divisor=data_size, mesh=mesh)), 0.0, 255.0
    ).astype(jnp.uint8))


def save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).save(path)


def prefetched_batches(dataset, batch_size: int, depth: int = 2):
    """Yield ``dataset.batches(batch_size)`` items produced by a background
    thread (cv2 decode + padding overlap device compute).

    Producer exceptions (e.g. an unreadable image) are re-raised in the
    consumer — a dead producer that never enqueues its sentinel would
    otherwise hang the main loop on ``Queue.get()`` forever."""
    import queue
    import threading

    batch_q: "queue.Queue" = queue.Queue(maxsize=depth)

    def _producer():
        try:
            for item in dataset.batches(batch_size):
                batch_q.put(item)
            batch_q.put(None)
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            batch_q.put(e)

    threading.Thread(target=_producer, daemon=True).start()
    while True:
        item = batch_q.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def run_benchmark(
    pipe: DewarpPipeline,
    dataset: BenchmarkDataset,
    out_dir: str,
    *,
    batch_size: int = 8,
    rng: Optional[jax.Array] = None,
    save_outputs: bool = True,
    save_coord_maps: bool = False,
    mesh=None,
    profile_dir: Optional[str] = None,
) -> Dict[str, float]:
    """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis for
    multi-chip data-parallel serving (params replicated, batch sharded —
    XLA lays the collectives on ICI).  ``mesh="auto"`` builds a 1-D data
    mesh over all visible devices when there is more than one and the
    batch divides them."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    pred_dir = os.path.join(out_dir, "dewarped_pred")
    os.makedirs(pred_dir, exist_ok=True)

    if mesh == "auto":
        from dvd_tpu.parallel.mesh import make_mesh

        ndev = jax.device_count()
        mesh = make_mesh(model=1) if (
            ndev > 1 and batch_size % ndev == 0) else None

    put_batch = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("data"))
        for attr in ("seg_vars", "line_vars", "geotr_vars", "vgg_vars"):
            if getattr(pipe, attr) is not None:
                setattr(pipe, attr, jax.tree.map(
                    lambda x: jax.device_put(x, replicated),
                    getattr(pipe, attr)))
        if mesh.shape.get("model", 1) > 1:
            # tensor-parallel serving: the DiT blocks + SATRN decoder
            # projections shard over the model axis (same _TP_RULES the
            # training step uses); XLA inserts the head-gather collectives
            # on ICI.  Aux conv nets stay replicated — they are batch-bound.
            from dvd_tpu.parallel.mesh import shard_params

            pipe.dit_vars = shard_params(pipe.dit_vars, mesh)
        else:
            pipe.dit_vars = jax.tree.map(
                lambda x: jax.device_put(x, replicated), pipe.dit_vars)
        put_batch = lambda x: jax.device_put(jnp.asarray(x), batch_sh)

    cond_fn, sample_fn = pipe.jitted_stages()

    # uint8 on the wire in both directions: host<->device copies ride a
    # tunnel here, so fp32 canvases are 4x the bytes for nothing.
    # unwarp_native tiles its gathers over output rows internally
    # (grid_sample row_chunk), so HBM transients stay bounded at any
    # canvas size and the whole batch unwarps in one dispatch; the chunk
    # is sized to the per-device shard of the batch.
    data_size = mesh.shape["data"] if mesh is not None else 1
    unwarp = _unwarp_jit(data_size, mesh)

    def dewarp(src, step_rng):
        cond, init_flow, init_feat = cond_fn(src)
        return sample_fn(cond, init_flow, init_feat, step_rng)

    # overlap host work with device compute: dataset batches are produced
    # by a background thread (cv2 decode + padding), and PNG encoding runs
    # on a writer pool so it never blocks the next dispatch
    from concurrent.futures import ThreadPoolExecutor

    _batches = lambda: prefetched_batches(dataset, batch_size)

    writer = ThreadPoolExecutor(max_workers=4)
    pending = []

    def drain(inflight):
        """Pull one batch's device results to host and queue the writes."""
        nonlocal n_done
        outs_dev, flow_dev, batch = inflight
        out = np.concatenate([np.asarray(o) for o in outs_dev])
        flow_np = np.asarray(flow_dev)
        for j in range(batch["count"]):
            name = os.path.basename(batch["paths"][j])
            h, w = batch["hw"][j]
            if save_outputs:
                pending.append(writer.submit(
                    save_png, os.path.join(pred_dir, f"warped_{name}"),
                    out[j, :h, :w]))
            if save_coord_maps:
                pending.append(writer.submit(
                    np.save, os.path.join(pred_dir, f"coord_{name}.npy"),
                    flow_np[j]))
        n_done += batch["count"]

    # all jitted tracing (and any retrace) must happen inside the
    # mesh context: the Pallas kernels detect the ambient mesh at
    # trace time and wrap themselves in shard_map per data-shard
    # (pallas_call has no SPMD partitioning rule — see ops/pallas/spmd.py)
    import contextlib

    with mesh if mesh is not None else contextlib.nullcontext():
        n_done = 0
        compile_time = 0.0
        t_start = None
        inflight = None                 # one batch stays on device while the
        for bi, batch in enumerate(_batches()):   # next one is dispatched
            # uint8 on the wire (tunnel H2D ~80 MB/s); normalize on device
            src_u8 = put_batch(
                np.clip(np.asarray(batch["source_image"]) * 255.0 + 0.5,
                        0, 255).astype(np.uint8))
            src = src_u8.astype(jnp.float32) / 255.0
            padded = put_batch(batch["source_padded"])
            hw = put_batch(batch["hw"])

            step_rng = jax.random.fold_in(rng, bi)
            t0 = time.perf_counter()
            flow = dewarp(src, step_rng)
            outs_dev = [unwarp(padded, hw, flow)]
            if bi == 0:
                jax.block_until_ready(outs_dev)
                # first batch pays compilation; exclude from throughput
                compile_time = time.perf_counter() - t0
                t_start = time.perf_counter()
                if profile_dir:
                    # trace steady-state only: tracing across the remote
                    # compile hangs the axon tunnel
                    jax.profiler.start_trace(profile_dir)

            if inflight is not None:
                drain(inflight)
            inflight = (outs_dev, flow, batch)
            last_inputs = (src, padded, hw, step_rng)

        if inflight is not None:
            drain(inflight)

        for fut in pending:          # surface writer errors before reporting
            fut.result()
        writer.shutdown()
        t_end = time.perf_counter()

        if profile_dir:
            jax.profiler.stop_trace()   # trace dump is NOT part of throughput
            print(f"profiler trace written to {profile_dir}")

        if n_done > batch_size:
            # steady state: exclude the compile-paying first batch
            total = t_end - (t_start or t_end)
            n_timed = n_done - batch_size
        else:
            # single-batch run: the compile batch is all there is
            total = compile_time
            n_timed = n_done
        stats = {
            "images": n_done,
            "seconds_total": round(total, 3),
            "imgs_per_sec": round(n_timed / total, 3) if total > 0 else 0.0,
            "compile_seconds": round(compile_time, 3),
        }
        if n_done:
            # per-stage steady-state timings (synced re-runs of the last
            # batch, outside the throughput window) so perf regressions are
            # attributable per stage across rounds
            src, padded, hw, step_rng = last_inputs
            stage = {}
            # scalar readback of an output element is the reliable completion
            # barrier through the remote tunnel (block_until_ready can return
            # with executions in flight); jitted so the extract is one
            # dispatch, not three eager tunnel round-trips
            scalar = jax.jit(lambda l: jnp.ravel(l)[0].astype(jnp.float32))
            for name, fn in (
                ("conditioning", lambda: cond_fn(src)),
                ("sample", lambda: sample_fn(*cond_fn(src), step_rng)),
                ("unwarp", lambda: unwarp(padded, hw, flow)),
            ):
                float(scalar(jax.tree.leaves(fn())[0]))   # warm scalar-extract
                t0 = time.perf_counter()
                float(scalar(jax.tree.leaves(fn())[0]))
                stage[name] = round(time.perf_counter() - t0, 4)
            stage["sample"] = round(
                max(stage["sample"] - stage["conditioning"], 0.0), 4)
            stats["stage_seconds_per_batch"] = stage
        with open(os.path.join(out_dir, "run_stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
    return stats


def run_from_config(cfg: DvDConfig, rng: Optional[jax.Array] = None,
                    profile_dir: Optional[str] = None) -> Dict[str, float]:
    """CLI-facing entry: build pipeline + dataset from config, run."""
    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(cfg.train.seed))
    # load converted checkpoints when present
    from dvd_tpu.training.checkpoint import maybe_load_pipeline_weights

    maybe_load_pipeline_weights(pipe, cfg)
    ds = BenchmarkDataset.from_dir(cfg.data.eval_dataset,
                                   source_size=cfg.model.source_size)
    out_dir = os.path.join("vis_hp", cfg.data.eval_dataset_name, cfg.name)
    # eval_device_batch is per-chip; scale to the global batch so the
    # auto data mesh shards it back to the per-chip optimum
    global_batch = cfg.data.eval_device_batch * max(1, jax.device_count())
    return run_benchmark(pipe, ds, out_dir,
                         batch_size=global_batch, rng=rng,
                         mesh="auto", profile_dir=profile_dir)
