#!/usr/bin/env python
"""Training entry point (CLI parity with the reference's
``run_training.py``; single-controller JAX replaces the reference's
``mpiexec`` launch — multi-host TPU slices initialize via
``jax.distributed.initialize``).

Example:
  python run_training.py --train_module dvd --train_name train_TDiff \
      --set data.data_root=/data/doc3d --set train.batch_size=10
"""

import argparse
import dataclasses


def data_iterator(cfg, seed: int):
    """Host data pipeline: Doc3D samples -> prefetched numpy batches.

    ``cfg.train.batch_size`` is the per-process batch (reference
    semantics: batch 10 per GPU, global = batch x world,
    ``train_util.py:97``); each process loads its rank-strided slice of
    the epoch order."""
    import jax
    import numpy as np

    from dvd_tpu.data.doc3d import (Doc3DDataset, load_texture_list,
                                    make_doc3d_sample_list)
    from dvd_tpu.data.doc_npz import (AugDocNpzDataset, DocNpzDataset,
                                      make_doc_sample_list)
    from dvd_tpu.data.loader import PrefetchLoader

    textures = (load_texture_list(cfg.data.texture_list)
                if cfg.data.texture_list else ())
    # dataset_name switch, matching the reference's train_TDiff.py:99-127
    # (doc_debug -> Doc_Dataset, aug_doc -> Aug_Doc_Dataset, doc3d ->
    # Doc3d_Dataset; its Mix_Dataset import is broken upstream — see
    # dvd_tpu/data/doc_npz.py)
    name = cfg.data.dataset_name
    dev_aug = cfg.train.on_device_aug
    it, iT = cfg.data.inter_t, cfg.data.inter_T
    if name == "doc3d":
        ds = Doc3DDataset(samples=make_doc3d_sample_list(cfg.data.data_root),
                          textures=textures, inter_t=it, inter_T=iT,
                          device_aug=dev_aug)
    elif name == "doc_debug":
        if dev_aug:
            raise ValueError("on_device_aug requires an augmenting dataset "
                             "(doc3d | aug_doc); doc_debug has no warp/jitter")
        ds = DocNpzDataset(samples=make_doc_sample_list(cfg.data.data_root))
    elif name == "aug_doc":
        ds = AugDocNpzDataset(samples=make_doc_sample_list(cfg.data.data_root),
                              textures=textures, inter_t=it, inter_T=iT,
                              device_aug=dev_aug)
    else:
        raise ValueError(f"unknown dataset_name {name!r} "
                         "(doc3d | doc_debug | aug_doc)")
    keys = (("image512", "doc_mask512", "flow_map") if dev_aug
            else ("source_image", "doc_mask", "flow_map", "flow_map_inter"))
    if dev_aug and _device_dataset_ok(cfg, ds):
        return device_resident_iterator(cfg, ds, seed)
    return PrefetchLoader(ds, batch_size=cfg.train.batch_size,
                          num_workers=cfg.data.n_threads, seed=seed,
                          keys=keys,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())


def _device_dataset_ok(cfg, ds) -> bool:
    """Device-resident dataset gate: on_device_aug + single process +
    total raw bytes under ``train.device_dataset_max_gb``."""
    import jax

    mode = cfg.train.device_dataset
    if mode == "off" or jax.process_count() != 1:
        return False
    n = len(ds.samples)
    gb = n * (512 * 512 * (3 + 1 + 2 * 4)) / 1e9   # u8 img+mask, f32 flow
    ok = gb <= cfg.train.device_dataset_max_gb
    if mode == "on" and not ok:
        raise ValueError(f"device_dataset=on but dataset is ~{gb:.1f} GB "
                         f"(> train.device_dataset_max_gb)")
    return ok


def device_resident_iterator(cfg, ds, seed: int):
    """Stage every raw (pre-augmentation) sample in HBM once; per-step
    batches are on-device gathers — zero steady-state host->device
    traffic.

    With ``on_device_aug`` the per-step augmentation randomness
    (intermediate warp + color jitter) lives on the accelerator
    (``data/device_aug.py``), so staged samples stay fresh across
    epochs.  The remaining *host-side* randomness (tight-crop +
    background compositing) is frozen per staging at ``seed`` — one
    crop/background variant per sample per run segment instead of one
    per epoch; ``--segment_steps`` runs re-stage each segment with a new
    loader seed, restoring that diversity at segment granularity.  On this repo's tunnel-served bench
    host the float wire costs ~3 s/step at batch 8 (48 MB/step over
    ~20 MB/s) while the device step takes 0.33 s — this iterator removes
    the wire entirely (the reference's CPU-worker loader,
    ``listdataset.py:573-703``, has no analogue: it must re-augment on
    the host every epoch).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = len(ds.samples)
    imgs, masks, flows = [], [], []
    for i in range(n):
        item = ds.__getitem__(i, seed=seed * 100003 + i)
        imgs.append(item["image512"].astype(np.uint8))     # exact: source
        masks.append(item["doc_mask512"].astype(np.uint8))  # is uint8
        flows.append(item["flow_map"].astype(np.float32))
    dev_img = jnp.asarray(np.stack(imgs))
    dev_msk = jnp.asarray(np.stack(masks))
    dev_flow = jnp.asarray(np.stack(flows))
    print(f"device-resident dataset: {n} samples, "
          f"{(dev_img.nbytes + dev_msk.nbytes + dev_flow.nbytes)/1e6:.0f} "
          "MB staged in HBM", flush=True)

    b = cfg.train.batch_size
    rng = np.random.RandomState(seed)

    def gen():
        order = rng.permutation(n)
        pos = 0
        while True:
            if pos + b > n:
                order = rng.permutation(n)
                pos = 0
            idx = jnp.asarray(order[pos:pos + b])
            pos += b
            yield {
                "image512": jnp.take(dev_img, idx, 0).astype(jnp.float32),
                "doc_mask512": jnp.take(dev_msk, idx, 0).astype(jnp.float32),
                "flow_map": jnp.take(dev_flow, idx, 0),
            }

    return gen()


def _run_segments(ap, args):
    """Chain child training processes of <= segment_steps each.

    Each child saves a final checkpoint on exit (train_loop.train's
    unconditional save) and the next child auto-resumes from it
    (bit-continuity of resume is covered by tests/test_resume_continuity).
    The loader gets a fresh seed per segment so epoch orders don't repeat
    across segment restarts; the train-step RNG keys off the *global*
    step (train_state.py fold_in), so the gradient-noise stream is
    unaffected by segmentation."""
    import glob
    import os
    import subprocess
    import sys

    if not args.max_steps:
        ap.error("--segment_steps requires --max_steps")
    if args.segment_steps < 1:
        ap.error("--segment_steps must be >= 1")

    from run_sampling import parse_overrides

    from dvd_tpu.config import default_config

    cfg = default_config()
    cfg = dataclasses.replace(cfg.replace(**parse_overrides(args.overrides)),
                              name=args.name)
    ws = os.path.join(cfg.paths.workspace_dir, cfg.name)

    def latest_step() -> int:
        # orbax state dirs are named state_%08d with the post-step counter
        steps = [int(os.path.basename(p)[6:])
                 for p in glob.glob(os.path.join(ws, "state_*"))
                 if os.path.basename(p)[6:].isdigit()]
        return max(steps, default=0)

    child_base = [sys.executable, os.path.abspath(__file__),
                  "--train_module", args.train_module,
                  "--train_name", args.train_name,
                  "--name", args.name, "--seed", str(args.seed)]
    for ov in args.overrides or ():
        child_base += ["--set", ov]
    if args.data_root:
        child_base += ["--data_root", args.data_root]
    if args.synthetic:
        child_base += ["--synthetic", str(args.synthetic)]
    if args.multihost:
        child_base += ["--multihost"]

    seg = 0
    while True:
        start = latest_step()
        if start >= args.max_steps:
            print(f"segments done: step {start} >= {args.max_steps}")
            return
        budget = min(start + args.segment_steps, args.max_steps)
        child = child_base + [
            "--max_steps", str(budget),
            "--loader_seed", str((args.loader_seed if args.loader_seed
                                  is not None else args.seed) + 9973 * seg)]
        print(f"— segment {seg}: steps {start} -> {budget} —", flush=True)
        rc = subprocess.call(child)
        end = latest_step()
        if end <= start:
            raise SystemExit(
                f"segment {seg} made no checkpoint progress (rc={rc}, "
                f"still at step {end}); aborting instead of looping")
        if rc != 0:
            print(f"segment {seg} exited rc={rc} but advanced "
                  f"{start} -> {end}; continuing", flush=True)
        seg += 1


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_module", default="dvd")
    ap.add_argument("--train_name", default="train_TDiff")
    ap.add_argument("--name", default="default")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--set", action="append", dest="overrides", metavar="K=V")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="generate an N-sample synthetic Doc3D-format "
                         "dataset (data.data_root or a temp dir) and train "
                         "on it through the standard loader path")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() first")
    ap.add_argument("--loader_seed", type=int, default=None,
                    help="epoch-order/augmentation seed for the data "
                         "loader only (default: --seed); lets resumed "
                         "segments draw fresh epoch orders without "
                         "touching the train-step RNG stream")
    ap.add_argument("--segment_steps", type=int, default=0, metavar="K",
                    help="run training as a chain of child processes of "
                         "at most K steps each, auto-resuming from the "
                         "latest checkpoint between segments (requires "
                         "--max_steps).  Bounds host RSS on serving hosts "
                         "whose PJRT tunnel client retains every "
                         "host->device transfer buffer for the process "
                         "lifetime (see dvd_tpu/training/wire.py)")
    args = ap.parse_args(argv)

    if args.segment_steps:
        return _run_segments(ap, args)

    if args.multihost:
        import jax

        jax.distributed.initialize()

    from run_sampling import parse_overrides

    from dvd_tpu.config import default_config
    from dvd_tpu.training.train_loop import train
    from dvd_tpu.utils import runtime

    cfg = default_config()
    over = parse_overrides(args.overrides)
    if args.data_root:
        over.setdefault("data", {})["data_root"] = args.data_root
    over.setdefault("train", {}).setdefault("seed", args.seed)
    cfg = dataclasses.replace(cfg.replace(**over), name=args.name)

    runtime.enable_compilation_cache()
    if args.synthetic:
        import os

        from dvd_tpu.data.doc_npz import write_synthetic_doc_npz
        from dvd_tpu.data.synthetic import write_synthetic_doc3d

        # never generate into a real dataset root: make_doc3d_sample_list
        # globs every sample dir, so syn_* dirs written alongside real
        # Doc3D samples would silently pollute later real training runs
        root = (os.path.join(cfg.data.data_root, "synthetic")
                if cfg.data.data_root else "checkpoints/synthetic_doc3d")
        if cfg.data.dataset_name == "doc3d":
            write_synthetic_doc3d(root, args.synthetic, seed=args.seed)
        else:
            write_synthetic_doc_npz(root, args.synthetic, seed=args.seed)
        cfg = cfg.replace(data={"data_root": root})
    loader = data_iterator(cfg, args.loader_seed
                           if args.loader_seed is not None else args.seed)
    if cfg.train.on_device_aug:
        # the loader already emits the device-aug key set
        # (image512/doc_mask512/flow_map); augmentation runs on device
        mapped = iter(loader)
    elif cfg.train.slim_wire:
        from dvd_tpu.training.wire import encode_batch

        latent = cfg.model.image_size
        mapped = (encode_batch(b, latent) for b in loader)
    else:
        mapped = ({"source_image": b["source_image"],
                   "doc_mask": b["doc_mask"],
                   "flow_map": b["flow_map"],
                   "flow_map_inter": b["flow_map_inter"]} for b in loader)
    train(cfg, mapped, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
