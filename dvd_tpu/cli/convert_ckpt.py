"""Convert the reference's torch checkpoints to this framework's format.

Usage:
  python -m dvd_tpu.cli.convert_ckpt --kind dit  --src model1852000.pt --dst checkpoints/model1852000.msgpack
  python -m dvd_tpu.cli.convert_ckpt --kind seg  --src seg.pth        --dst checkpoints/seg.msgpack
  python -m dvd_tpu.cli.convert_ckpt --kind seg_model --src seg_model.pth --dst checkpoints/seg_model.msgpack
  python -m dvd_tpu.cli.convert_ckpt --kind line --src line_model2.pth --dst checkpoints/line_model2.msgpack
  python -m dvd_tpu.cli.convert_ckpt --kind vgg  --src vgg16.pth      --dst checkpoints/vgg16.msgpack

Kinds encode each file's quirks (reference ``geotr_core.py:1075-1111``,
``val_TDiff.py:66-79``):
- ``seg``        : 'module.'-prefixed GeoTr_Seg state dict (strip 7)
- ``seg_model``  : nested under 'model' sub-dict
- ``line``       : nested under 'model' sub-dict
- ``dit``        : plain DiT state dict
- ``vgg``        : torchvision vgg16 state dict

``--validate`` additionally initializes the target flax model and checks
the converted tree structurally (missing/extra/shape-mismatched leaves).
"""

from __future__ import annotations

import argparse
import sys


def convert(kind: str, src: str, dst: str, validate: bool = False) -> None:
    from dvd_tpu.training import convert as C
    from dvd_tpu.training.checkpoint import save_variables

    if kind == "dit":
        sd = C.load_torch_state_dict(src)
        variables = C.convert_state_dict(sd, C.DIT_RULES)
    elif kind == "seg":
        sd = C.load_torch_state_dict(src, strip_prefix=7)
        variables = C.convert_state_dict(sd, C.GEOTR_SEG_RULES)
    elif kind == "seg_model":
        sd = C.load_torch_state_dict(src, sub_key="model")
        variables = C.convert_state_dict(sd, C.U2NETP_RULES)
    elif kind == "line":
        sd = C.load_torch_state_dict(src, sub_key="model")
        variables = C.convert_state_dict(sd, C.LINE_UNET_RULES)
    elif kind == "vgg":
        sd = C.load_torch_state_dict(src)
        variables = C.convert_state_dict(sd, C.VGG16_RULES)
    else:
        raise SystemExit(f"unknown kind {kind}")

    if validate:
        problems = _validate(kind, variables)
        if problems:
            print("STRUCTURE PROBLEMS:")
            for p in problems[:50]:
                print(" ", p)
            raise SystemExit(1)

    save_variables(dst, variables)
    n = sum(x.size for x in _leaves(variables))
    print(f"wrote {dst}: {n/1e6:.2f}M scalars")


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def _validate(kind: str, variables):
    import jax
    import jax.numpy as jnp

    from dvd_tpu.training import convert as C

    if kind == "dit":
        from dvd_tpu.models.dit import make_dit

        m = make_dit("DiT-S/2", input_size=64, tv=True)
        ref = m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2)), jnp.zeros((1,)),
            y512=jnp.zeros((1, 512, 512, 3)), mask_cat=jnp.zeros((1, 512, 512, 1)),
            mask_y512=jnp.zeros((1, 64, 64, 384)), line_msk=jnp.zeros((1, 64, 64, 64)),
            init_flow=jnp.zeros((1, 64, 64, 2)), init_feat=jnp.zeros((1, 64, 64, 256)),
        )
    elif kind == "seg":
        from dvd_tpu.models.geotr import GeoTrSegInf

        ref = GeoTrSegInf().init(jax.random.PRNGKey(0), jnp.zeros((1, 288, 288, 3)))
    elif kind == "seg_model":
        from dvd_tpu.models.u2net import Seg

        ref = Seg().init(jax.random.PRNGKey(0), jnp.zeros((1, 288, 288, 3)))
    elif kind == "line":
        from dvd_tpu.models.textline_unet import TextLineUNet

        ref = TextLineUNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 288, 288, 3)))
    elif kind == "vgg":
        from dvd_tpu.models.vgg import VGG16Pyramid

        ref = VGG16Pyramid().init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    else:
        return []
    problems = C.validate_against(variables, ref, "params")
    if "batch_stats" in ref:
        problems += C.validate_against(variables, ref, "batch_stats")
    return problems


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", required=True,
                    choices=["dit", "seg", "seg_model", "line", "vgg"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--validate", action="store_true")
    a = ap.parse_args(argv)
    convert(a.kind, a.src, a.dst, a.validate)


if __name__ == "__main__":
    main()
