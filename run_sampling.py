#!/usr/bin/env python
"""Benchmark sampling entry point (CLI parity with the reference's
``run_sampling.py``).

The reference dynamically imports ``train_settings.{module}.{name}`` and
calls its ``run(settings)`` (reference ``run_sampling.py:48-50``); here
``--train_module/--train_name`` select a config profile instead, with all
``admin/local.py`` flags overridable as ``--set section.key=value``.

Example:
  python run_sampling.py --train_module dvd --train_name val_TDiff \
      --name exp1 --set data.eval_dataset=/data/docunet
"""

import argparse
import ast
import sys


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        key, _, val = p.partition("=")
        sec, _, field = key.partition(".")
        try:
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        out.setdefault(sec, {})[field] = val
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    # reference flags (run_sampling.py:67-74)
    ap.add_argument("--train_module", default="dvd")
    ap.add_argument("--train_name", default="val_TDiff")
    ap.add_argument("--name", default="default")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--corruption", default=None,
                    help="corruption-robustness sweep id (reference "
                         "run_sampling.py:52-58); 'all' sweeps every id")
    # ours
    ap.add_argument("--set", action="append", dest="overrides", metavar="K=V")
    ap.add_argument("--eval_dataset", default=None)
    ap.add_argument("--eval_dataset_name", default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--image", default=None,
                    help="dewarp a single image file instead of a dataset")
    ap.add_argument("--out", default=None, help="output path for --image")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the run to DIR")
    args = ap.parse_args(argv)

    from dvd_tpu.config import default_config

    cfg = default_config()
    over = parse_overrides(args.overrides)
    if args.eval_dataset:
        over.setdefault("data", {})["eval_dataset"] = args.eval_dataset
    if args.eval_dataset_name:
        over.setdefault("data", {})["eval_dataset_name"] = args.eval_dataset_name
    if args.batch:
        over.setdefault("data", {})["eval_device_batch"] = args.batch
    if over:
        cfg = cfg.replace(**over)
    import dataclasses

    cfg = dataclasses.replace(cfg, name=args.name)

    import contextlib

    import jax

    from dvd_tpu.utils import runtime

    runtime.enable_compilation_cache()

    if args.image:
        import os

        if not os.path.isfile(args.image):
            ap.error(f"--image: no such file: {args.image}")
        dewarp_single_image(cfg, args.image,
                            args.out or _default_out(args.image), args.seed)
        return

    from dvd_tpu.evaluation.driver import run_from_config

    if args.corruption:
        run_corruption_sweep(cfg, args)
        return

    stats = run_from_config(cfg, rng=jax.random.PRNGKey(args.seed),
                            profile_dir=args.profile)
    print(f"Elapsed: {stats['images']} images, "
          f"{stats['imgs_per_sec']} imgs/sec "
          f"(compile {stats['compile_seconds']}s)")


def _default_out(image_path):
    import os

    base = os.path.basename(image_path)
    return os.path.join("vis_hp", "single", f"warped_{base}")


def dewarp_single_image(cfg, image_path, out_path, seed):
    """Reference config #1: single-image dewarp -> PNG + coord map."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from dvd_tpu.evaluation.pipeline import DewarpPipeline, unwarp_fixed
    from dvd_tpu.training.checkpoint import maybe_load_pipeline_weights

    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(seed))
    maybe_load_pipeline_weights(pipe, cfg)

    ori = np.asarray(Image.open(image_path).convert("RGB"))
    s = cfg.model.source_size
    src = np.asarray(Image.fromarray(ori).resize((s, s), Image.BILINEAR),
                     np.float32)[None] / 255.0

    cond_fn, sample_fn = pipe.jitted_stages()
    cond, init_flow, init_feat = cond_fn(jnp.asarray(src))
    flow = sample_fn(cond, init_flow, init_feat, jax.random.PRNGKey(seed))
    out = unwarp_fixed(jnp.asarray(ori, jnp.float32)[None], flow)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(np.clip(np.asarray(out)[0], 0, 255).astype(np.uint8)
                    ).save(out_path)
    np.save(out_path + ".coords.npy", np.asarray(flow)[0])
    print(f"wrote {out_path} (+ .coords.npy)")


def run_corruption_sweep(cfg, args, severities=(1, 2, 3, 4, 5)):
    """Reference run_sampling.py:52-58: severities x corruption ids.

    One ``DewarpPipeline`` serves every (corruption, severity) combination
    — its jitted stages are cached on the instance, so the 75-combo sweep
    compiles the two serving stages exactly once instead of retracing per
    combo.  Returns ``(pipe, {(name, sev): stats})``."""
    import jax

    from dvd_tpu.data.benchmark import BenchmarkDataset
    from dvd_tpu.data.corruptions import CORRUPTIONS, corrupt
    from dvd_tpu.evaluation.driver import run_benchmark
    from dvd_tpu.evaluation.pipeline import DewarpPipeline
    from dvd_tpu.training.checkpoint import maybe_load_pipeline_weights

    names = sorted(CORRUPTIONS) if args.corruption == "all" \
        else [args.corruption]
    unknown = [n for n in names if n not in CORRUPTIONS]
    if unknown:
        raise SystemExit(
            f"unknown corruption(s) {unknown}; valid: {sorted(CORRUPTIONS)}")

    pipe = DewarpPipeline.create(cfg, rng=jax.random.PRNGKey(args.seed))
    maybe_load_pipeline_weights(pipe, cfg)

    base_ds = BenchmarkDataset.from_dir(cfg.data.eval_dataset,
                                        source_size=cfg.model.source_size)
    import os

    import numpy as np

    results = {}
    for name in names:
        for sev in severities:
            class CorruptedDS(BenchmarkDataset):
                def __getitem__(self, i, _n=name, _s=sev):
                    item = super().__getitem__(i)
                    item["source_image"] = corrupt(item["source_image"], _n, _s)
                    pad = item["source_padded"].astype(np.float32) / 255.0
                    pad = (corrupt(pad, _n, _s) * 255).astype(np.uint8)
                    item["source_padded"] = pad
                    return item

            ds = CorruptedDS(paths=base_ds.paths,
                             source_size=cfg.model.source_size)
            out_dir = os.path.join("vis_hp", cfg.data.eval_dataset_name,
                                   f"{cfg.name}_corrupt_{name}_s{sev}")
            stats = run_benchmark(pipe, ds, out_dir,
                                  batch_size=cfg.data.eval_device_batch,
                                  rng=jax.random.PRNGKey(args.seed))
            print(f"{name} s{sev}: {stats['imgs_per_sec']} imgs/sec, "
                  f"{stats['images']} images")
            results[(name, sev)] = stats
    return pipe, results


if __name__ == "__main__":
    main()
