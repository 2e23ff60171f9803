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
    return PrefetchLoader(ds, batch_size=cfg.train.batch_size,
                          num_workers=cfg.data.n_threads, seed=seed,
                          keys=keys,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())


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
    args = ap.parse_args(argv)

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
    loader = data_iterator(cfg, args.seed)
    mapped = ({"source_image": b["source_image"],
               "doc_mask": b["doc_mask"],
               "flow_map": b["flow_map"],
               "flow_map_inter": b["flow_map_inter"]} for b in loader)
    train(cfg, mapped, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
