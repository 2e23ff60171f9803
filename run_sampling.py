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

    import jax

    from dvd_tpu.evaluation.driver import run_from_config
    from dvd_tpu.utils import runtime

    runtime.enable_compilation_cache()
    stats = run_from_config(cfg, rng=jax.random.PRNGKey(args.seed))
    print(f"Elapsed: {stats['images']} images, "
          f"{stats['imgs_per_sec']} imgs/sec "
          f"(compile {stats['compile_seconds']}s)")


if __name__ == "__main__":
    main()
