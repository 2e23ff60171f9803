#!/usr/bin/env python
"""Ablation timing of the SATRN fusion decoder on the real chip.

Times the full Decoder at production shape (eb=8, 32x32 tokens, d=1536),
then variants with one submodule stubbed to identity, attributing wall
time to attention / locality-aware FFN / the depthwise stage / layernorms.
Monkeypatches the satrn module per variant (timing only — every variant
re-inits its own params).

Writes docs/SATRN_PROFILE.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from dvd_tpu.models import satrn
    from dvd_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    EB, G, K = 8, 32, 4
    D = 384 * K
    x = jax.random.normal(jax.random.PRNGKey(0), (EB, G, G, D), jnp.bfloat16)

    from dvd_tpu.utils.bench_timing import make_fuse, timed_ms

    fuse = make_fuse()

    class IdentityN(nn.Module):
        """Identity that accepts any extra call args."""

        @nn.compact
        def __call__(self, x, *a, **kw):
            return x

    def timed(iters=20):
        dec = satrn.Decoder(n_layers=6, n_head=6, d_k=64 * K, d_v=64 * K,
                            d_model=D, n_position=G, d_inner=2048,
                            dtype=jnp.bfloat16)
        vs = jax.jit(dec.init)(jax.random.PRNGKey(1), x)
        fn = jax.jit(lambda v, a: dec.apply(v, a))
        return timed_ms(fn, vs, x, iters=iters, fuse=fuse)

    results = {}
    results["full"] = timed()

    orig_attn = satrn.SATRNAttention
    satrn.SATRNAttention = lambda *a, name=None, **kw: IdentityN(name=name)
    results["no_attention"] = timed()
    satrn.SATRNAttention = orig_attn

    orig_laf = satrn.LocalityAwareFeedforward
    satrn.LocalityAwareFeedforward = lambda *a, name=None, **kw: IdentityN(name=name)
    results["no_laf"] = timed()
    satrn.LocalityAwareFeedforward = orig_laf

    # layernorm ablation: patch flax.linen.LayerNorm (restored after) —
    # DecoderLayer and the final norm resolve it at call time
    orig_ln = nn.LayerNorm
    nn.LayerNorm = lambda *a, name=None, **kw: IdentityN(name=name)
    try:
        results["no_layernorm"] = timed()
    finally:
        nn.LayerNorm = orig_ln

    # depthwise-conv ablation: LAF without the 3x3 depthwise stage
    class LAFNoDW(nn.Module):
        d_in: int
        d_hid: int
        dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, y, use_running_average=True):
            y = satrn.ConvBNReLU(self.d_hid, 1, dtype=self.dtype, name="conv1")(
                y, use_running_average)
            return satrn.ConvBNReLU(self.d_in, 1, dtype=self.dtype, name="conv2")(
                y, use_running_average)

    satrn.LocalityAwareFeedforward = \
        lambda d_in, d_hid, dtype=jnp.bfloat16, quant=False, name=None: \
        LAFNoDW(d_in, d_hid, name=name)
    results["no_depthwise"] = timed()
    satrn.LocalityAwareFeedforward = orig_laf

    # jnp (non-Pallas) attention comparison needs a separate process with
    # DVD_TPU_DISABLE_PALLAS=1; note it here for the record
    out = {"device": str(jax.devices()[0]), "shape": [EB, G, G, D],
           "pallas_disabled": bool(os.environ.get("DVD_TPU_DISABLE_PALLAS")),
           "ms": {k: round(v, 3) for k, v in results.items()}}
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SATRN_PROFILE.json")
    mode = "_jnp" if out["pallas_disabled"] else ""
    with open(path.replace(".json", mode + ".json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
