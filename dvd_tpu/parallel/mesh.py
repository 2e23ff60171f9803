"""Device mesh + sharding rules.

The reference's distribution story is single-host MPI-rendezvous DDP
(reference ``dist_util.py:21-72``, ``train_util.py:126-135``): parameters
replicated, batch split, gradients all-reduced.  The TPU-native equivalent
here is a ``jax.sharding.Mesh`` with axes:

- ``data``  — batch sharding; gradient reduction becomes the psum XLA
  inserts for the replicated-param/sharded-batch jit (DDP's allreduce)
- ``model`` — optional tensor parallelism over attention heads / MLP
  hidden dims of the DiT + SATRN decoder (the reference has no TP; this is
  a capability the TPU design adds, riding ICI)

Parameters can additionally be FSDP-sharded over ``data`` via
``fsdp=True`` (largest-axis sharding, zero-1 style).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` consumes remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


# (regex over 'a/b/c' param path) -> PartitionSpec. First match wins.
# Column-parallel projections shard their output dim; row-parallel shard
# the input dim so the pair needs only one all-reduce (inserted by XLA).
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*/attn/qkv/kernel", P(None, "model")),
    (r".*/attn/qkv/bias", P("model")),
    (r".*/attn/proj/kernel", P("model", None)),
    (r".*/cross_attn.*/(q_proj|k_proj|v_proj)/kernel", P(None, "model")),
    (r".*/cross_attn.*/(q_proj|k_proj|v_proj)/bias", P("model")),
    (r".*/cross_attn.*/out_proj/kernel", P("model", None)),
    (r".*/mlp/fc1/kernel", P(None, "model")),
    (r".*/mlp/fc1/bias", P("model")),
    (r".*/mlp/fc2/kernel", P("model", None)),
    (r".*/decoder/.*/(linear_q|linear_k|linear_v)/kernel", P(None, "model")),
    (r".*/decoder/.*/attn/fc/kernel", P("model", None)),
)


def tp_rule_spec(path: str) -> Optional[P]:
    """Raw (unfiltered) _TP_RULES spec for a param path, or None.

    Unlike ``param_sharding_rules`` this does NOT fall back to replicated
    when a dim fails to divide — divisibility guards must see the intended
    spec, not the degraded one."""
    for pat, spec in _TP_RULES:
        if re.fullmatch(pat, path):
            return spec
    return None


def param_path(keypath) -> str:
    """'a/b/c' string for a jax tree keypath (matches _TP_RULES paths)."""
    return "/".join(
        getattr(k, "key", getattr(k, "idx", "?")).__str__() for k in keypath
    )


def param_sharding_rules(path: str, shape: Tuple[int, ...],
                         mesh: Mesh, fsdp: bool = False) -> P:
    """PartitionSpec for one parameter."""
    model_size = mesh.shape.get("model", 1)
    if model_size > 1:
        for pat, spec in _TP_RULES:
            if re.fullmatch(pat, path):
                # only shard if the dim divides evenly
                dims = [d for d in spec]
                ok = True
                for axis_idx, name in enumerate(dims):
                    if name == "model" and shape[axis_idx] % model_size != 0:
                        ok = False
                if ok:
                    return spec
    if fsdp:
        data_size = mesh.shape.get("data", 1)
        if shape:
            biggest = int(np.argmax(shape))
            if shape[biggest] % data_size == 0 and shape[biggest] >= 2 * data_size:
                spec = [None] * len(shape)
                spec[biggest] = "data"
                return P(*spec)
    return P()  # replicated


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Apply sharding rules to a parameter pytree (device_put with the
    resolved NamedShardings)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for keypath, leaf in flat:
        spec = param_sharding_rules(
            param_path(keypath), np.shape(leaf), mesh, fsdp)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def sharding_tree(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """NamedSharding pytree matching ``params`` (for jit in/out shardings)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for keypath, leaf in flat:
        out.append(NamedSharding(
            mesh,
            param_sharding_rules(
                param_path(keypath), np.shape(leaf), mesh, fsdp)))
    return jax.tree_util.tree_unflatten(treedef, out)
