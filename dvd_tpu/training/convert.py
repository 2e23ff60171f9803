"""torch -> flax checkpoint conversion.

The reference ships four torch checkpoints (``admin/local.py:77-80``):
``model1852000.pt`` (DiT), ``seg.pth`` (GeoTr+U2NetP, 'module.'-prefixed),
``seg_model.pth`` (Seg, nested under 'model.' / 6-char-stripped keys),
``line_model2.pth`` (text-line UNet under a 'model' sub-dict) — plus
torchvision VGG16 for the ``train_VGG=False`` path.  This module converts
their state dicts into this framework's flax variable trees.

Mechanics:
- conv weights   (O, I, kh, kw) -> (kh, kw, I, O)
- linear weights (O, I)         -> (I, O)
- norm ``weight``/``bias``      -> ``scale``/``bias`` params
- BN ``running_mean``/``running_var`` -> the ``batch_stats`` collection
- ``nn.MultiheadAttention`` packed ``in_proj_weight``/``in_proj_bias`` ->
  separate q/k/v projections
- module-path rewrite rules (regex) per model family map torch module
  names onto this framework's (deliberately similar) flax param paths.

Everything operates on plain numpy; no torch import is required unless
reading an actual ``.pt`` file.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

FlatDict = Dict[str, np.ndarray]


# --------------------------------------------------------------------------
# loading


def load_torch_state_dict(path: str, sub_key: Optional[str] = None,
                          strip_prefix: int = 0) -> FlatDict:
    """Read a torch checkpoint into {key: np.ndarray}.

    ``sub_key``: take ``ckpt[sub_key]`` first (the line/seg checkpoints nest
    under 'model'); ``strip_prefix``: drop N leading characters from every
    key (reference reload_model strips 7 for 'module.', reload_segmodel 6
    for 'model.' — geotr_core.py:1075-1111).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if sub_key is not None:
        ckpt = ckpt[sub_key]
    out = {}
    for k, v in ckpt.items():
        if strip_prefix:
            k = k[strip_prefix:]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


# --------------------------------------------------------------------------
# leaf conversion


def _set(tree: dict, path: List[str], leaf: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate destination {'/'.join(path)}")
    node[path[-1]] = leaf


def _convert_leaf(key: str, val: np.ndarray) -> List[Tuple[str, str, np.ndarray]]:
    """One torch tensor -> [(collection, dest-leaf-name, array), ...].

    ``key`` is the rewritten path whose last segment is the torch attribute
    (weight/bias/running_mean/...).
    """
    parts = key.split(".")
    attr = parts[-1]

    if attr == "in_proj_weight":
        d = val.shape[0] // 3
        return [
            ("params", "q_proj.kernel", val[:d].T),
            ("params", "k_proj.kernel", val[d:2 * d].T),
            ("params", "v_proj.kernel", val[2 * d:].T),
        ]
    if attr == "in_proj_bias":
        d = val.shape[0] // 3
        return [
            ("params", "q_proj.bias", val[:d]),
            ("params", "k_proj.bias", val[d:2 * d]),
            ("params", "v_proj.bias", val[2 * d:]),
        ]
    if attr == "weight":
        if val.ndim == 4:
            return [("params", "kernel", val.transpose(2, 3, 1, 0))]
        if val.ndim == 2:
            return [("params", "kernel", val.T)]
        return [("params", "scale", val)]  # norm affine
    if attr == "bias":
        return [("params", "bias", val)]
    if attr == "running_mean":
        return [("batch_stats", "mean", val)]
    if attr == "running_var":
        return [("batch_stats", "var", val)]
    if attr in ("num_batches_tracked",):
        return []
    if attr in ("query_embed", "pos_embed", "row_embed", "col_embed"):
        # bare nn.Parameter / nn.Embedding tables renamed by a rule to
        # their flax leaf name — pass through unchanged
        return [("params", attr, val)]
    raise ValueError(f"unhandled torch attribute {attr!r} in {key!r}")


def apply_rules(key: str, rules: List[Tuple[str, str]]) -> Optional[str]:
    """Apply regex rewrite rules in order; a rule mapping to None drops the
    key (dead parameters)."""
    for pat, repl in rules:
        if repl is None and (re.fullmatch(pat, key.rsplit(".", 1)[0])
                             or re.fullmatch(pat, key)):
            return None
    out = key
    for pat, repl in rules:
        if repl is None:
            continue
        out = re.sub(pat, repl, out)
    return out


def convert_state_dict(sd: FlatDict, rules: List[Tuple[str, str]],
                       skip: Tuple[str, ...] = ()) -> Dict[str, Any]:
    """FlatDict + rewrite rules -> flax variables {params: ..., batch_stats: ...}."""
    variables: Dict[str, Any] = {"params": {}}
    for key, val in sorted(sd.items()):
        if any(re.fullmatch(s, key) for s in skip):
            continue
        new_key = apply_rules(key, rules)
        if new_key is None:
            continue
        module_path = new_key.split(".")[:-1]
        for coll, leaf_name, arr in _convert_leaf(new_key, np.asarray(val)):
            variables.setdefault(coll, {})
            _set(variables[coll], module_path + leaf_name.split("."),
                 np.ascontiguousarray(arr))
    return variables


# --------------------------------------------------------------------------
# per-model rewrite rules

# generic: ModuleList "name.3." -> "name_3."
_IDX = r"\.([0-9]+)\."


def _listify(*names: str) -> List[Tuple[str, str]]:
    return [(rf"\b({n})\.([0-9]+)\.", r"\1_\2.") for n in names]


DIT_RULES: List[Tuple[str, str]] = [
    # dead/deterministic buffers
    (r"noised_obs_pos_embed", None),
    (r"decoder\.position_dec\.(h|w)_position_encoder", None),
    *_listify("blocks", "layer_stack"),
    # private pyramid Sequential indices -> named convs
    (r"pyramid\.level_0\.0\.", r"pyramid.level_0_conv0."),
    (r"pyramid\.level_1\.0\.", r"pyramid.level_1_conv0."),
    (r"pyramid\.level_2\.0\.", r"pyramid.level_2_conv0."),
    (r"pyramid\.level_2\.2\.", r"pyramid.level_2_conv1."),
    (r"pyramid\.level_3\.0\.", r"pyramid.level_3_conv0."),
    (r"pyramid\.level_3\.2\.", r"pyramid.level_3_conv1."),
    (r"pyramid\.level_3\.4\.", r"pyramid.level_3_conv2."),
    # timestep MLP Sequential
    (r"t_embedder\.mlp\.0\.", r"t_embedder.mlp_0."),
    (r"t_embedder\.mlp\.2\.", r"t_embedder.mlp_2."),
    # adaLN Sequential(SiLU, Linear)
    (r"adaLN_modulation\.1\.", r"adaLN_modulation_1."),
    # SATRN decoder: ConvModule .conv/.bn stay; scale nets are Sequentials
    (r"position_dec\.h_scale\.0\.", r"position_dec.h_scale_0."),
    (r"position_dec\.h_scale\.2\.", r"position_dec.h_scale_2."),
    (r"position_dec\.w_scale\.0\.", r"position_dec.w_scale_0."),
    (r"position_dec\.w_scale\.2\.", r"position_dec.w_scale_2."),
]

U2NETP_RULES: List[Tuple[str, str]] = []  # names align 1:1 already

GEOTR_SEG_RULES: List[Tuple[str, str]] = [
    # second (dead) cross-attn of each attnLayer is never used
    (r".*multihead_attn_list\.1(\..*)?", None),
    (r".*norm2_list\.1(\..*)?", None),
    (r".*dropout.*", None),
    *_listify("layers"),
    (r"multihead_attn_list\.0\.", r"multihead_attn_0."),
    (r"norm2_list\.0\.", r"norm2_0."),
    # RAFT encoder residual layers: Sequential of 2 blocks
    (r"fnet\.layer([0-9])\.([0-9])\.", r"fnet.layer\1_\2."),
    (r"downsample\.0\.", r"downsample_0."),
    (r"downsample\.1\.", None),  # instance norm: no params
    # update block heads
    (r"update_block\.flow_head\.conv1\.", r"update_block.flow_head_conv1."),
    (r"update_block\.flow_head\.conv2\.", r"update_block.flow_head_conv2."),
    (r"update_block\.mask\.0\.", r"update_block.mask_0."),
    (r"update_block\.mask\.2\.", r"update_block.mask_2."),
    # GeoTr owns query_embed; our TransDecoder holds it
    (r"GeoTr\.query_embed\.weight", r"GeoTr.TransDecoder.query_embed"),
    (r"^query_embed\.weight", r"TransDecoder.query_embed"),
]

LINE_UNET_RULES: List[Tuple[str, str]] = [
    (r"inc\.double_conv\.0\.", r"inc.conv_0."),
    (r"inc\.double_conv\.1\.", r"inc.bn_1."),
    (r"inc\.double_conv\.3\.", r"inc.conv_3."),
    (r"inc\.double_conv\.4\.", r"inc.bn_4."),
    (r"(down[0-9])\.maxpool_conv\.1\.double_conv\.0\.", r"\1.conv_0."),
    (r"(down[0-9])\.maxpool_conv\.1\.double_conv\.1\.", r"\1.bn_1."),
    (r"(down[0-9])\.maxpool_conv\.1\.double_conv\.3\.", r"\1.conv_3."),
    (r"(down[0-9])\.maxpool_conv\.1\.double_conv\.4\.", r"\1.bn_4."),
    (r"(up[0-9])\.conv\.double_conv\.0\.", r"\1.conv_0."),
    (r"(up[0-9])\.conv\.double_conv\.1\.", r"\1.bn_1."),
    (r"(up[0-9])\.conv\.double_conv\.3\.", r"\1.conv_3."),
    (r"(up[0-9])\.conv\.double_conv\.4\.", r"\1.bn_4."),
    (r"outc\.conv\.", r"outc."),
]

def unet_qkv_perm(c3: int, num_heads: int) -> np.ndarray:
    """Channel permutation torch->flax for the improved-diffusion QKV conv.

    The reference's ``QKVAttention`` reshapes the 3c qkv channels to
    ``[b*heads, 3c/heads, T]`` and splits per head (``unet.py:218-228``):
    channel j = (head, part in q/k/v, within) at
    ``j = head*3*dh + part*dh + within``.  Our ``AttentionBlock`` splits
    the Dense output globally into q|k|v with heads contiguous inside
    each: ``j' = part*c + head*dh + within``.  Both concatenate heads
    contiguously on output, so this input-side permutation is the only
    difference."""
    c = c3 // 3
    dh = c // num_heads
    perm = np.empty(c3, np.int64)
    for h in range(num_heads):
        for p in range(3):
            src = h * 3 * dh + p * dh
            dst = p * c + h * dh
            perm[dst:dst + dh] = np.arange(src, src + dh)
    return perm


def preprocess_unet_attention(sd: FlatDict, num_heads: int) -> FlatDict:
    """Squeeze the reference UNet's 1x1 conv1d attention weights to 2-D
    linear layout and apply the per-head qkv channel permutation (see
    :func:`unet_qkv_perm`).  ``num_heads`` must equal num_heads_upsample
    (the reference default ``-1`` aliases them)."""
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.endswith(".qkv.weight"):
            v = v[..., 0][unet_qkv_perm(v.shape[0], num_heads)]
        elif k.endswith(".qkv.bias"):
            v = v[unet_qkv_perm(v.shape[0], num_heads)]
        elif k.endswith(".proj_out.weight") and v.ndim == 3:
            v = v[..., 0]
        out[k] = v
    return out


_RESBLOCK_RULES: List[Tuple[str, str]] = [
    # GroupNorm32 wraps an anonymous flax GroupNorm -> extra path segment
    (r"\.in_layers\.0\.", r".norm_in.GroupNorm_0."),
    (r"\.in_layers\.2\.", r".conv_in."),
    (r"\.emb_layers\.1\.", r".emb_proj."),
    (r"\.out_layers\.0\.", r".norm_out.GroupNorm_0."),
    (r"\.out_layers\.3\.", r".conv_out."),
    (r"\.norm\.", r".norm.GroupNorm_0."),  # AttentionBlock pre-norm
]


def unet_rules(channel_mult: Tuple[int, ...] = (1, 2, 3, 4),
               num_res_blocks: int = 3,
               attention_ds: Tuple[int, ...] = (4, 8)
               ) -> List[Tuple[str, str]]:
    """Rewrite rules for ``UNetModel_stage1``/``_sr`` (``unet.py:552-853``)
    -> :class:`~dvd_tpu.models.unet_denoiser.UNetDenoiser`.

    The torch module enumerates blocks as flat ``input_blocks.{i}`` /
    ``output_blocks.{j}`` ModuleLists whose composition depends on
    (channel_mult, num_res_blocks, attention_ds); this regenerates the
    exact index map for a given config.  Run the state dict through
    :func:`preprocess_unet_attention` first.
    """
    rules: List[Tuple[str, str]] = [
        (r"^time_embed\.0\.", r"time_embed_0."),
        (r"^time_embed\.2\.", r"time_embed_2."),
        (r"^input_blocks\.0\.0\.", r"in_conv."),
        (r"^middle_block\.0\.", r"middle_res1."),
        (r"^middle_block\.1\.", r"middle_attn."),
        (r"^middle_block\.2\.", r"middle_res2."),
        (r"^out\.0\.", r"out_norm.GroupNorm_0."),
        (r"^out\.2\.", r"out_conv."),
    ]
    idx, ds, bi = 1, 1, 0
    for level in range(len(channel_mult)):
        for _ in range(num_res_blocks):
            rules.append((rf"^input_blocks\.{idx}\.0\.", rf"down_{bi}."))
            if ds in attention_ds:
                rules.append((rf"^input_blocks\.{idx}\.1\.",
                              rf"down_attn_{bi}."))
            idx += 1
            bi += 1
        if level != len(channel_mult) - 1:
            rules.append((rf"^input_blocks\.{idx}\.0\.op\.",
                          rf"downsample_{level}."))
            idx += 1
            ds *= 2
    j = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            rules.append((rf"^output_blocks\.{j}\.0\.", rf"up_{j}."))
            li = 1
            if ds in attention_ds:
                rules.append((rf"^output_blocks\.{j}\.{li}\.",
                              rf"up_attn_{j}."))
                li += 1
            if level and i == num_res_blocks:
                rules.append((rf"^output_blocks\.{j}\.{li}\.conv\.",
                              rf"upsample_{level}."))
                ds //= 2
            j += 1
    return rules + _RESBLOCK_RULES


TRANSFORMER_RULES: List[Tuple[str, str]] = [
    # DDIMWithTransformer (transformer.py:57-137); block internals:
    # MultiheadAttention in_proj/out_proj handled by _convert_leaf,
    # ffn Sequential(Linear, ReLU, Linear), post-norms
    (r"^time_embed\.0\.", r"time_embed_0."),
    (r"^time_embed\.2\.", r"time_embed_2."),
    *_listify("input_blocks", "output_blocks"),
    (r"\.ffn\.0\.", r".ffn_0."),
    (r"\.ffn\.2\.", r".ffn_2."),
    (r"^out\.1\.", r"out_1."),
]


VGG16_RULES: List[Tuple[str, str]] = [
    (r"classifier\..*", None),
    (r"features\.0\.", r"level_0_conv0."),
    (r"features\.2\.", r"level_1_conv0."),
    (r"features\.5\.", r"level_2_conv0."),
    (r"features\.7\.", r"level_2_conv1."),
    (r"features\.(1[79]|2[1-9]).*", None),  # levels beyond /8 unused
    (r"features\.10\.", r"level_3_conv0."),
    (r"features\.12\.", r"level_3_conv1."),
    (r"features\.14\.", r"level_3_conv2."),
]


# --------------------------------------------------------------------------
# FrozenBatchNorm destination fixup

def split_frozen_bn(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Our FrozenBatchNorm stores scale/bias in params and mean/var in
    batch_stats under the same module path — convert_state_dict already
    produces that layout, so this is a no-op hook kept for clarity."""
    return variables


# --------------------------------------------------------------------------
# structure validation


def flatten_tree(tree: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def validate_against(variables: Dict[str, Any], reference_vars: Dict[str, Any],
                     collection: str = "params") -> List[str]:
    """Compare converted tree structure/shapes against a model.init tree.
    Returns a list of human-readable problems (empty = exact match)."""
    got = flatten_tree(variables.get(collection, {}))
    want = flatten_tree(
        {k: v for k, v in reference_vars.get(collection, {}).items()}
    )
    problems = []
    for k in sorted(set(want) - set(got)):
        problems.append(f"missing {collection}/{k} {want[k].shape}")
    for k in sorted(set(got) - set(want)):
        problems.append(f"unexpected {collection}/{k} {got[k].shape}")
    for k in sorted(set(got) & set(want)):
        if got[k].shape != want[k].shape:
            problems.append(
                f"shape mismatch {collection}/{k}: {got[k].shape} vs {want[k].shape}"
            )
    return problems
