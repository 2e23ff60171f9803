#!/usr/bin/env python
"""Extract per-rate EMA msgpack snapshots from an orbax TrainState dir.

``train_loop.train``'s unconditional end-of-run save writes the full
orbax state (which embeds the EMA trees) but not the standalone
``ema_{rate}_{step}.msgpack`` files that the serving checkpoint loader
consumes — those are written on ``save_interval`` boundaries only.  When
a run disables interval saves (e.g. to avoid the 2.3 GB device->host
fetch per save on a tunnel-served host), this tool recovers the EMA
files from the final state:

  JAX_PLATFORMS=cpu python tools/extract_ema.py --workspace checkpoints/r5_long \
      --set model.remap_rollout_timesteps=True --set train.ema_rate=0.999,0.99
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--set", action="append", dest="overrides", metavar="K=V")
    ap.add_argument("--state", default=None,
                    help="state dir (default: latest in workspace)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from run_sampling import parse_overrides

    from dvd_tpu.config import default_config
    from dvd_tpu.training import checkpoint as ckpt

    cfg = default_config().replace(**parse_overrides(args.overrides))
    path = args.state or ckpt.latest_checkpoint(args.workspace)
    if not path:
        raise SystemExit(f"no state dir under {args.workspace}")

    # template-free restore: the on-disk tree layout is authoritative
    # (tuples come back as lists), so no live model/optimizer needed
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    step = int(tree["step"])
    rates = cfg.train.ema_rates
    emas = tree["ema_params"]
    if not isinstance(emas, (list, tuple)):   # legacy single-tree layout
        emas = [emas] * len(rates)
    assert len(emas) == len(rates), (len(emas), rates)
    for rate, params in zip(rates, emas):
        out = os.path.join(args.workspace, f"ema_{rate}_{step:06d}.msgpack")
        ckpt.save_variables(out, {"params": params,
                                  "batch_stats": tree.get("batch_stats")
                                  or {}})
        print("wrote", out)


if __name__ == "__main__":
    main()
