"""Checkpoint save/load.

Two formats:
- **Model variable files** (``.msgpack``): flax-serialized variable trees
  — the output of the torch->flax converter and the format the inference
  pipeline loads (stand-ins for the reference's ``model{step}.pt`` /
  ``seg.pth`` / ``seg_model.pth`` / ``line_model2.pth``).
- **Training state directories** (orbax): full TrainState (params,
  optimizer, EMA, step) with step-numbered subdirs, mirroring the
  reference's ``model{step:06d}.pt`` + ``ema_*`` + ``opt{step}.pt`` trio
  (``train_util.py:599-624``) in one atomic checkpoint; resume restores
  all three plus the step counter (``train_util.py:148-204,645-657``).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


# --------------------------------------------------------------- msgpack IO


def _to_numpy(a):
    """Host-fetch one leaf.  Multi-host sharded arrays (e.g. FSDP'd EMA
    params) span non-addressable devices — ``np.asarray`` would raise —
    so gather the global value first (every process participates)."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


def save_variables(path: str, variables: Dict[str, Any],
                   write: bool = True) -> None:
    """Serialize a variable tree to msgpack.  The host fetch is a
    *collective* when leaves are multi-host sharded, so under multi-host
    training every process must call this — pass ``write=False`` on
    non-primary processes to participate in the gather without writing."""
    from flax import serialization

    np_tree = jax.tree.map(_to_numpy, variables)
    if not write:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    raw = serialization.msgpack_serialize(np_tree)
    with open(path, "wb") as f:
        f.write(raw)


def load_variables(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def maybe_load_pipeline_weights(pipe, cfg) -> Dict[str, bool]:
    """Load any converted checkpoints that exist at the configured paths
    (reference ``local.py:77-80``); silently keep random init otherwise so
    smoke runs work without weights."""
    loaded = {}
    table = [
        ("dit_vars", cfg.paths.model_path),
        ("geotr_vars", cfg.paths.seg_model_path),
        ("line_vars", cfg.paths.line_seg_model_path),
        ("seg_vars", cfg.paths.new_seg_model_path),
    ]
    for attr, path in table:
        ok = False
        for cand in (path, path + ".msgpack",
                     re.sub(r"\.(pt|pth|npz)$", ".msgpack", path)):
            if os.path.isfile(cand):
                setattr(pipe, attr, load_variables(cand))
                ok = True
                break
        loaded[attr] = ok
    return loaded


# ----------------------------------------------------------------- orbax IO


def _ckpt_dir(workspace: str, step: int) -> str:
    return os.path.join(os.path.abspath(workspace), f"state_{step:08d}")


def save_train_state(workspace: str, state, step: Optional[int] = None,
                     primary: bool = True) -> str:
    """Orbax save.  Under multi-host training this is a *collective* —
    every process must call it (orbax coordinates shard writes; the
    reference instead wrote on rank 0 behind a dist.barrier,
    ``train_util.py:599-624``).  ``primary`` is accepted for caller
    symmetry; orbax handles per-process responsibilities itself.
    ``workspace`` must be shared storage on real multi-host pods."""
    del primary
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = _ckpt_dir(workspace, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def save_ema_snapshots(workspace: str, cfg, state, step: int,
                       primary: bool = True) -> None:
    """Per-rate EMA weight files alongside the orbax state, mirroring the
    reference's ``ema_{rate}_{step:06d}.pt`` (``train_util.py:599-614``).
    Loadable as plain model variable files (msgpack).

    Collective under multi-host training (the EMA trees may be FSDP-
    sharded): every process must call it; only ``primary`` writes."""
    for rate, tree in zip(cfg.train.ema_rates, state.ema_params):
        save_variables(
            os.path.join(workspace, f"ema_{rate}_{step:06d}.msgpack"),
            {"params": tree, "batch_stats": state.batch_stats},
            write=primary)


def latest_checkpoint(workspace: str) -> Optional[str]:
    if not os.path.isdir(workspace):
        return None
    steps = []
    for name in os.listdir(workspace):
        m = re.fullmatch(r"state_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return _ckpt_dir(workspace, max(steps))


def restore_train_state(path: str, template) -> Any:
    import dataclasses

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path, template)
    except (ValueError, TypeError, KeyError) as e:
        # migration: checkpoints written before multi-rate EMA stored
        # ema_params as a single param tree, not a tuple of trees.  Retry
        # with the legacy layout and broadcast the restored tree to every
        # configured rate (the reference's find_ema_checkpoint likewise
        # falls back to the model params when a rate file is missing,
        # train_util.py:190-204).  Only tree-structure errors retry —
        # IO/corruption errors propagate unmasked.
        if not (isinstance(template.ema_params, tuple)
                and len(template.ema_params) >= 1):
            raise
        import logging

        logging.getLogger(__name__).info(
            "restore with multi-rate EMA template failed (%s); retrying "
            "with the single-tree legacy layout", e)
        legacy = dataclasses.replace(template,
                                     ema_params=template.ema_params[0])
        restored = ckptr.restore(path, legacy)
        return dataclasses.replace(
            restored,
            ema_params=tuple(restored.ema_params
                             for _ in template.ema_params))
