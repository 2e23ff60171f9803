#!/usr/bin/env python
"""Micro-probe: why the 288^2 small-channel aux convs are HBM-bound.

Hypothesis (round 5): the conditioning stack's U2NetP/line-UNet tensors
are NHWC with C=16..64; TPU tiles the two minor dims to (16, 128) for
bf16, so a C=16 feature map is lane-padded 16 -> 128 and every HBM
materialization moves up to 8x the useful bytes.  This tool measures one
REBNCONV-shaped conv (3x3, stride 1) at 288^2 under different logical
layouts/channel counts and reports the implied HBM rate against the
*unpadded* analytic bytes — if the NHWC C=16 row lands near peak-/8
useful bandwidth while C=128 lands near peak, padding is confirmed and a
planar (C-major) Pallas conv is the fix.

Run on the chip:  python tools/conv_layout_probe.py
Writes docs/CONV_LAYOUT_PROBE.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BYTES = 819e9      # v5e HBM GB/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, default=288)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="docs/CONV_LAYOUT_PROBE.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dvd_tpu.utils.bench_timing import make_fuse, timed_s
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    fuse = make_fuse()
    b, hw = args.batch, args.hw
    dt = jnp.bfloat16
    rows = []

    def run(name, fn, *concrete, useful_bytes):
        jf = jax.jit(fn)
        try:
            t = timed_s(jf, *concrete, iters=args.iters, fuse=fuse)
        except Exception as e:  # noqa: BLE001
            rows.append({"case": name, "error": repr(e)[:200]})
            print(f"{name} failed: {e!r}", flush=True)
            return
        row = {"case": name, "ms": round(t * 1e3, 3),
               "useful_mb": round(useful_bytes / 1e6, 2),
               "useful_gbps": round(useful_bytes / t / 1e9, 1),
               "pct_useful_of_peak": round(100 * useful_bytes / t / PEAK_BYTES, 1)}
        rows.append(row)
        print(row, flush=True)

    key = jax.random.PRNGKey(0)

    # --- NHWC lax.conv at several channel widths -------------------------
    for c in (16, 32, 64, 128):
        x = jax.random.normal(key, (b, hw, hw, c), dt)
        w = jax.random.normal(key, (3, 3, c, c), dt)

        def conv_nhwc(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        useful = (x.size + x.size + w.size) * 2  # read x, write y, read w
        run(f"nhwc_c{c}", conv_nhwc, x, w, useful_bytes=useful)

    # --- NCHW logical layout (XLA may transpose internally) --------------
    for c in (16, 64):
        x = jax.random.normal(key, (b, c, hw, hw), dt)
        w = jax.random.normal(key, (c, c, 3, 3), dt)

        def conv_nchw(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        useful = (x.size * 2 + w.size) * 2
        run(f"nchw_c{c}", conv_nchw, x, w, useful_bytes=useful)

    # --- NCHW shift-einsum formulation (9 accumulated dots) --------------
    for c in (16,):
        x = jax.random.normal(key, (b, c, hw, hw), dt)
        w = jax.random.normal(key, (9, c, c), dt)

        def conv_shift9(x, w):
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
            y = None
            k = 0
            for dy in range(3):
                for dx in range(3):
                    xs = lax.dynamic_slice(
                        xp, (0, 0, dy, dx), (b, c, hw, hw))
                    t = jnp.einsum("oc,nchw->nohw", w[k], xs,
                                   preferred_element_type=jnp.float32)
                    y = t if y is None else y + t
                    k += 1
            return y.astype(dt)

        useful = (x.size * 2 + w.size) * 2
        run(f"nchw_shift9_c{c}", conv_shift9, x, w, useful_bytes=useful)

    # --- pure elementwise copy controls (layout tax, no conv) ------------
    for c in (16, 128):
        x = jax.random.normal(key, (b, hw, hw, c), dt)
        run(f"copy_nhwc_c{c}", lambda x: x * 1.0000001 + 0.1, x,
            useful_bytes=2 * x.size * 2)
    x = jax.random.normal(key, (b, 16, hw, hw), dt)
    run("copy_nchw_c16", lambda x: x * 1.0000001 + 0.1, x,
        useful_bytes=2 * x.size * 2)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": b, "hw": hw,
                   "peak_bytes": PEAK_BYTES, "rows": rows}, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
