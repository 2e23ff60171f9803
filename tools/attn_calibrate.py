#!/usr/bin/env python
"""Microbenchmark: SATRN-shaped attention pieces vs bare matmul on the
real chip — separates MXU floor, transpose cost, softmax cost, and
whole-block cost so optimization targets the real slack.
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from dvd_tpu.models.layers import merge_heads, scaled_dot_attention, split_heads
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    EB, T, D, H = 8, 1024, 1536, 6
    DH = D // H
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (EB, T, D), jnp.bfloat16)
    w = jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02
    q4 = jax.random.normal(key, (EB, H, T, DH), jnp.bfloat16)

    from dvd_tpu.utils.bench_timing import make_fuse, timed_ms

    fuse = make_fuse()

    def timed(fn, *a, iters=30):
        return timed_ms(jax.jit(fn), *a, iters=iters, fuse=fuse)

    r = {}
    r["matmul_8192x1536x1536"] = timed(lambda a, b: a @ b, x, w)
    r["matmul_x4"] = timed(lambda a, b: ((a @ b) @ b @ b) @ b, x, w)
    r["split_merge_heads"] = timed(
        lambda a: merge_heads(split_heads(a, H) * 2.0), x)
    r["attn_core"] = timed(
        lambda q, k, v: scaled_dot_attention(q, k, v), q4, q4, q4)
    import os
    os.environ["DVD_TPU_DISABLE_PALLAS"] = "1"
    r["attn_core_jnp"] = timed(
        lambda q, k, v: scaled_dot_attention(q, k, v), q4, q4, q4)
    del os.environ["DVD_TPU_DISABLE_PALLAS"]

    def full_block(a, wq, wk, wv, wf):
        q = split_heads(a @ wq, H)
        k = split_heads(a @ wk, H)
        v = split_heads(a @ wv, H)
        o = scaled_dot_attention(q, k, v)
        return merge_heads(o) @ wf

    r["full_attn_block"] = timed(full_block, x, w, w, w, w)
    print(json.dumps({k: round(v, 3) for k, v in r.items()}, indent=2))


if __name__ == "__main__":
    main()
