"""Wall-clock timing helpers for the remote-TPU tunnel.

Through the axon tunnel ``block_until_ready()`` can return while
executions are still in flight, silently inflating throughput numbers.
The only reliable completion barrier is a host readback of a scalar that
depends on EVERY timed output — the ``fuse`` pattern below.  Every
benchmark in this repo (bench.py and tools/*) goes through these helpers
so the barrier semantics live in one audited place.

Also calibrated here-ish (docs/ROOFLINE.md): each dispatched execution
carries ~1 ms of launch overhead that does not overlap with compute, so
single-op timings read ~1 ms high; prefer deltas or multi-op jits.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional


def make_fuse():
    """A jitted reducer mapping any pytree of arrays to one fp32 scalar."""
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda xs: sum(
        x.astype(jnp.float32).sum() for x in jax.tree.leaves(xs)))


def timed_s(
    fn: Callable[..., Any],
    *args: Any,
    iters: int = 20,
    fuse: Optional[Callable[..., Any]] = None,
) -> float:
    """Mean wall seconds per call of ``fn(*args)`` over ``iters``
    dispatches, completion-barriered by a fused-scalar readback.

    Warms both ``fn`` and ``fuse`` at the exact ``iters``-length pytree
    structure used for timing (jit caches by structure — warming at a
    different one would put a compile inside the timed window).
    """
    fuse = fuse if fuse is not None else make_fuse()
    float(fuse([fn(*args)] * iters))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(fuse(outs))
    return (time.perf_counter() - t0) / iters


def timed_ms(fn: Callable[..., Any], *args: Any, iters: int = 20,
             fuse: Optional[Callable[..., Any]] = None) -> float:
    return timed_s(fn, *args, iters=iters, fuse=fuse) * 1e3
