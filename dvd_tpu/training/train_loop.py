"""Training driver: data -> conditioning (frozen aux nets) -> sharded
train step -> checkpoints/metrics.

Maps the reference ``TrainLoop.run_loop_dewarping`` (``train_util.py:
211-344``) onto the TPU design:

- frozen Seg + line-UNet conditioning computed on device per batch
  (``:275-293``), under one jit with the train step
- GT flow normalization /(size-1) and 64^2 resize (``:306-312``)
- logging every ``log_interval``, checkpoints every ``save_interval``
  (``:333-339``) with per-quartile loss keys
- ``DVD_TRAINING_TEST=1`` stops after the first save (the reference's
  DIFFUSION_TRAINING_TEST integration-test hook, ``:336-339``)
- batch sharded over the mesh ``data`` axis; params replicated (or TP/FSDP
  per ParallelConfig) — XLA inserts the DDP-equivalent gradient psum
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dvd_tpu.config import DvDConfig
from dvd_tpu.diffusion.schedule import make_schedule
from dvd_tpu.evaluation.pipeline import DewarpPipeline
from dvd_tpu.models.u2net import seg_pyramid_to_latent
from dvd_tpu.ops.resize import resize_bilinear
from dvd_tpu.parallel.mesh import make_mesh, sharding_tree
from dvd_tpu.training import checkpoint as ckpt
from dvd_tpu.training.train_state import (create_train_state, make_optimizer,
                                          make_train_step)
from dvd_tpu.utils.logger import KVLogger, log_loss_quartiles


def train_aux_vars(pipe: DewarpPipeline):
    """The frozen-net variables ``build_device_batch`` needs, as one
    traced-argument tuple (weight-free HLO; see build_device_batch)."""
    return (pipe.seg_vars, pipe.line_vars, pipe.vgg_vars)


def build_device_batch(pipe: DewarpPipeline, aux_vars,
                       raw: Dict[str, jnp.ndarray],
                       latent: int) -> Dict[str, jnp.ndarray]:
    """Host batch -> conditioning + normalized flow targets (all NHWC).

    raw: source_image (B,512,512,3) [0,1], doc_mask (B,512,512,1),
         flow_map / flow_map_inter (B,512,512,2) absolute offsets.
    ``aux_vars = (seg_vars, line_vars, vgg_vars)`` must be traced jit
    arguments (not closure constants) to keep the HLO weight-free.

    Conditioning streams honor the reference's training-side flags
    (``train_util.py:275-304``): with ``use_gt_mask=True`` neither the seg
    pyramid nor the line stream is computed (``:291-293``); the line
    stream additionally needs ``use_line_mask=True`` (``:288-290``); with
    ``train_VGG=False`` the external torchvision-VGG features replace the
    DiT's private pyramid (``:296-304``, same `extract_raw_features_single2`
    the serving side uses).
    """
    seg_vars, line_vars, vgg_vars = aux_vars
    m = pipe.cfg.model
    per = m.perception_size
    src = raw["source_image"]
    if src.dtype == jnp.uint8:      # slim wire (training/wire.py)
        src = src.astype(jnp.float32) / 255.0
    h = src.shape[1]
    mask_cat = raw["doc_mask"]
    if mask_cat.dtype == jnp.uint8:
        mask_cat = mask_cat.astype(jnp.float32) / 255.0

    scale = jnp.asarray([h - 1.0, h - 1.0], jnp.float32)
    flow_inter = raw["flow_map_inter"] / scale
    if raw["flow_map"].shape[1] == latent:
        # already resized host-side (wire.encode_batch) — bilinear
        # resampling commutes with the scalar normalization
        flow64 = raw["flow_map"] / scale
    else:
        flow = raw["flow_map"] / scale
        flow64 = resize_bilinear(flow, (latent, latent), align_corners=True)

    batch = {
        "y512": src,
        "mask_cat": mask_cat,
        "flow64": flow64,
        "flow_inter": flow_inter,
        "mask": jnp.ones((src.shape[0], h, h, 1), jnp.float32),
    }

    from dvd_tpu.models.registry import is_dit_mode

    if not is_dit_mode(m.train_mode):
        # alternative denoisers take only the 64-ch VGG feature plane
        # (extract_raw_features_single, eval_utils.py:148) — no seg/line
        # streams, no DiT pyramid
        from dvd_tpu.models.vgg import c20_for_unet

        feats = pipe.vgg.apply(vgg_vars, src, mode="eigth")
        batch["src_feat"] = c20_for_unet(feats, latent)
        return batch

    if not m.use_gt_mask:
        src288 = resize_bilinear(src, (per, per), align_corners=True)
        mskx, _, hx6, hx5d, hx4d, hx3d, hx2d, hx1d = pipe.seg.apply(
            seg_vars, src288)
        batch["mask_y512"] = seg_pyramid_to_latent(
            (hx6, hx5d, hx4d, hx3d, hx2d, hx1d), latent)
        if m.use_line_mask:
            line_feat, _ = pipe.line.apply(line_vars, mskx)
            batch["line_msk"] = resize_bilinear(
                line_feat, (latent, latent), align_corners=False)

    if not m.train_VGG:
        from dvd_tpu.models.vgg import c20_for_dit

        feats = pipe.vgg.apply(vgg_vars, src, mode="eigth")
        batch["src_feat"] = c20_for_dit(feats, latent)
    return batch


def put_global_batch(raw: Dict[str, np.ndarray], batch_sh) -> Dict[str, jnp.ndarray]:
    """Host batch -> globally sharded device arrays.

    Single-process: a plain sharded device_put.  Multi-process: every
    host contributes its *local* shard of the global batch via
    ``jax.make_array_from_process_local_data`` (the reference's
    DDP-rank data sharding, ``dist_util.py:21-50``); the global batch is
    the concatenation of per-process shards in device order.
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(jnp.asarray(v), batch_sh)
                for k, v in raw.items()}
    return {k: jax.make_array_from_process_local_data(batch_sh, np.asarray(v))
            for k, v in raw.items()}


def fetch_metrics(metrics: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    """Host values of step metrics, multi-host safe.

    Replicated scalars fetch directly.  Per-sample vectors sharded over a
    multi-host ``data`` axis are NOT fully addressable — ``np.asarray``
    raises — so each process fetches its own addressable shards (its local
    samples).  Each host then logs its local quartiles and the KVLogger
    reduces across hosts, matching the reference's per-rank logging +
    ``mpi_weighted_mean`` (logger.py:413-440).
    """
    def fetch(v):
        if isinstance(v, jax.Array) and not v.is_fully_addressable:
            parts = {}  # dedupe model-axis replicas by data-axis offset
            for s in v.addressable_shards:
                start = (s.index[0].start or 0) if s.index else 0
                if start not in parts:
                    parts[start] = np.asarray(s.data)
            vals = [parts[k] for k in sorted(parts)]
            return vals[0] if len(vals) == 1 else np.concatenate(vals, axis=0)
        return np.asarray(v)

    return {k: fetch(v) for k, v in metrics.items()}


def train(cfg: DvDConfig, data_iter: Iterator[Dict[str, np.ndarray]],
          max_steps: Optional[int] = None,
          logger: Optional[KVLogger] = None) -> None:
    primary = jax.process_index() == 0
    if logger is None:
        # non-primary hosts keep local log output only (reference rank
        # layout: rank 0 stdout/csv/tb, others log — logger.py:443-478)
        logger = KVLogger(
            os.path.join(cfg.paths.workspace_dir, f"train_{cfg.name}")
            if primary else None,
            formats=("stdout", "csv", "jsonl") if primary else ())
    mesh = make_mesh(cfg.parallel.data_axis, cfg.parallel.model_axis)
    latent = cfg.model.image_size

    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(cfg.train.seed))
    ckpt.maybe_load_pipeline_weights(pipe, cfg)

    sched = make_schedule(
        steps=cfg.diffusion.diffusion_steps,
        schedule_name=cfg.diffusion.noise_schedule,
        respacing=cfg.diffusion.timestep_respacing,
        rescale_timesteps=cfg.diffusion.rescale_timesteps,
    )
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, pipe.dit_vars, tx)

    # resume (reference train_util.py:148-204)
    resume_path = cfg.train.resume_checkpoint or ckpt.latest_checkpoint(
        os.path.join(cfg.paths.workspace_dir, cfg.name))
    if resume_path and os.path.isdir(str(resume_path)):
        state = ckpt.restore_train_state(resume_path, state)
        logger.log(f"resumed from {resume_path} at step {int(state.step)}")

    train_step = make_train_step(cfg, sched, pipe.dit.apply, tx)

    with mesh:
        psh = sharding_tree(state.params, mesh, cfg.parallel.fsdp)
        state.params = jax.tree.map(jax.device_put, state.params, psh)
        state.ema_params = tuple(
            jax.tree.map(jax.device_put, e, psh) for e in state.ema_params)
        batch_sh = NamedSharding(mesh, P("data"))

        # device-aug batches carry image512/doc_mask512/flow_map; the
        # float wire carries pre-augmented source_image/... keys.  The
        # dispatch keys off the BATCH (the loader builds the key set from
        # the same flag via run_training.data_iterator) so callers that
        # feed pre-augmented batches directly (tests, custom loaders)
        # keep working when on_device_aug defaults on.
        from dvd_tpu.data.device_aug import augment_batch

        frac = cfg.data.inter_t / cfg.data.inter_T

        def _prep_aug(aux, raw, key):
            raw = augment_batch(raw, key, inter_frac=frac)
            return build_device_batch(pipe, aux, raw, latent)

        _aug_jit = jax.jit(_prep_aug)
        _plain_jit = jax.jit(
            lambda aux, raw: build_device_batch(pipe, aux, raw, latent))
        aug_rng = jax.random.PRNGKey(cfg.train.seed ^ 0x5EED)
        _warned = []

        def prep(raw, s):
            if "image512" in raw:
                return _aug_jit(train_aux_vars(pipe), raw,
                                jax.random.fold_in(aug_rng, s))
            if cfg.train.on_device_aug and not _warned:
                import warnings

                warnings.warn(
                    "train.on_device_aug=True but the batch carries the "
                    "pre-augmented float-wire keys; augmenting on the "
                    "host side as given", stacklevel=2)
                _warned.append(True)
            return _plain_jit(train_aux_vars(pipe), raw)
        step_fn = jax.jit(train_step, donate_argnums=(0,))

        rng = jax.random.PRNGKey(cfg.train.seed)
        t_last = time.perf_counter()
        ws = os.path.join(cfg.paths.workspace_dir, cfg.name)

        # track the step host-side: reading ``int(state.step)`` every
        # iteration is a device sync on the carried state, which would
        # serialize host-side load/prep of batch i+1 against device step i
        # (the device only blocks the host at log/save intervals)
        step = int(state.step)
        # ...but bound the run-ahead: without any backpressure a fast
        # loader could enqueue up to log_interval batches (~100+ MB of
        # prepped conditioning each) in HBM before the next sync.  A
        # sliding window over a per-step scalar keeps at most K batches
        # in flight at the cost of one tiny readback per step.
        from collections import deque

        inflight = deque()
        for raw in data_iter:
            if max_steps is not None and step >= max_steps:
                break
            raw = put_global_batch(raw, batch_sh)
            batch = prep(raw, step)
            state, metrics = step_fn(state, batch, rng)
            inflight.append(metrics["grad_norm"])
            if len(inflight) > 4:
                jax.block_until_ready(inflight.popleft())

            if step % cfg.train.log_interval == 0:
                m = fetch_metrics(metrics)
                log_loss_quartiles(logger, sched.num_timesteps, m.pop("t"),
                                   {"loss": m.pop("loss_per_sample"),
                                    "mse": m.pop("mse_per_sample")})
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                logger.logkv("step", step)
                logger.logkv("grad_norm", float(m["grad_norm"]))
                b = batch["flow64"].shape[0]
                logger.logkv("samples_per_sec",
                             b * cfg.train.log_interval / max(dt, 1e-9))
                logger.dumpkvs(step)

            if step > 0 and step % cfg.train.save_interval == 0:
                path = ckpt.save_train_state(ws, state, primary=primary)
                if primary:
                    logger.log(f"saved {path}")
                # collective (EMA trees may be multi-host sharded):
                # every process gathers, only primary writes
                ckpt.save_ema_snapshots(ws, cfg, state, step, primary=primary)
                if os.environ.get("DVD_TRAINING_TEST") or \
                        os.environ.get("DIFFUSION_TRAINING_TEST"):
                    return
            step += 1

        ckpt.save_train_state(ws, state, primary=primary)
