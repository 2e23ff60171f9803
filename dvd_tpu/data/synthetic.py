"""Synthetic Doc3D-format dataset generator.

Writes per-sample dirs (``img.png`` / ``bm.mat`` / ``recon.png``) in the
exact on-disk layout ``make_doc3d_sample_list`` / ``load_sample`` consume
(reference ``load_pre_made_dataset.py:7-20``, ``listdataset.py:89-95``),
so the *entire* production training path — h5py bm.mat parsing, tight
crop, background compositing, jitter, prefetch workers — runs unmodified
without the 100 GB Doc3D download.  Used by ``run_training.py
--synthetic N`` for training smoke/throughput runs on real hardware.

Construction: render a flat text document D, draw a smooth random
warp-to-flat map psi (warped -> flat coords), produce the photo
``img(q) = D(psi(q))`` by remap, and recover the backward map
``bm = psi^{-1}`` (flat -> warped coords) by fixed-point iteration —
so ``unwarp(img, bm) ≈ D`` holds exactly and the GT flow is learnable.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Tuple

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)
except Exception:  # pragma: no cover
    cv2 = None


def _render_doc_rgb(size: int, seed: int) -> np.ndarray:
    """Colored text document page, (size, size, 3) uint8."""
    from dvd_tpu.evaluation.calibrate import render_document

    rng = np.random.RandomState(seed)
    g = render_document(size, size, seed)
    tint = rng.uniform(0.88, 1.0, 3)
    rgb = np.clip(g[..., None] * tint[None, None], 0, 255).astype(np.uint8)
    return rgb


def _smooth_field(size: int, magnitude: float, rng: np.random.RandomState
                  ) -> np.ndarray:
    """Smooth random displacement field, (size, size, 2), ~magnitude px."""
    ys, xs = np.meshgrid(np.arange(size, dtype=np.float64),
                         np.arange(size, dtype=np.float64), indexing="ij")
    u = np.zeros((size, size, 2))
    for c in range(2):
        f1, f2 = rng.uniform(0.4, 1.2, 2)
        p1, p2 = rng.uniform(0, 2 * np.pi, 2)
        a1, a2 = rng.dirichlet([1, 1]) * magnitude
        u[..., c] = (a1 * np.sin(2 * np.pi * f1 * ys / size + p1)
                     + a2 * np.cos(2 * np.pi * f2 * xs / size + p2))
    return u.astype(np.float32)


def _invert_field(u: np.ndarray, iters: int = 10) -> np.ndarray:
    """Given psi(q) = q + u(q), return v with psi(p + v(p)) = p — the same
    fixed-point inversion as the metric calibration's oracle flow (one
    implementation, two call sites)."""
    from dvd_tpu.evaluation.calibrate import oracle_registration_flow

    return oracle_registration_flow(u, iters=iters)


def make_synthetic_sample(size: int, seed: int, magnitude: float = None
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (img RGB uint8, bm float32 (size,size,2) flat->warped abs coords,
    mask uint8 0/255 in the warped frame)."""
    rng = np.random.RandomState(seed)
    if magnitude is None:
        magnitude = rng.uniform(8.0, size * 0.07)
    doc = _render_doc_rgb(size, seed)

    # warped->flat sampling map psi(q) = q + u(q), shrunk toward the
    # center so the warped page sits inside the frame with margins
    margin = 0.08
    u = _smooth_field(size, magnitude, rng)
    ys, xs = np.meshgrid(np.arange(size, dtype=np.float32),
                         np.arange(size, dtype=np.float32), indexing="ij")
    scale = 1.0 / (1.0 - 2 * margin)
    psi_x = (xs - margin * size) * scale + u[..., 0]
    psi_y = (ys - margin * size) * scale + u[..., 1]

    img = cv2.remap(doc, psi_x, psi_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    inside = ((psi_x >= 0) & (psi_x <= size - 1)
              & (psi_y >= 0) & (psi_y <= size - 1))
    mask = (inside * 255).astype(np.uint8)
    img[~inside] = 0

    # bm = psi^{-1}: where flat pixel p lives in the warped photo
    du = np.stack([psi_x - xs, psi_y - ys], -1)
    v = _invert_field(du)
    bm = np.stack([xs + v[..., 0], ys + v[..., 1]], -1).astype(np.float32)
    return img, bm, mask


def write_synthetic_doc3d(root: str, n: int, size: int = 448,
                          seed: int = 0) -> str:
    """Write n samples under root in Doc3D layout; returns root.
    bm.mat is stored the way ``load_bm_mat`` reads it: an HDF5 ``bm``
    dataset whose ``transpose((2,1,0))`` yields (H, W, 2) coords in the
    [0, size-1] range (the reference's MATLAB-v7.3 axis order).

    Idempotent per (seed, size): a manifest records the generation
    parameters, and a rerun with different ones regenerates everything
    instead of silently mixing generations (or silently ignoring the new
    seed)."""
    import h5py

    if cv2 is None:
        raise RuntimeError("cv2 required to synthesize documents")
    os.makedirs(root, exist_ok=True)
    manifest_path = os.path.join(root, "synthetic_manifest.json")
    manifest = {"seed": seed, "size": size}
    stale = True
    if os.path.isfile(manifest_path):
        with open(manifest_path) as f:
            stale = json.load(f) != manifest
    if stale:
        for name in os.listdir(root):
            d = os.path.join(root, name)
            if name.startswith("syn_") and os.path.isdir(d):
                shutil.rmtree(d)
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)
    for i in range(n):
        d = os.path.join(root, f"syn_{i:05d}")
        if os.path.isfile(os.path.join(d, "recon.png")):
            continue  # already generated (idempotent across runs)
        os.makedirs(d, exist_ok=True)
        img, bm, mask = make_synthetic_sample(size, seed=seed * 100003 + i)
        cv2.imwrite(os.path.join(d, "img.png"), img[:, :, ::-1])
        # undo load_bm_mat's transform: it returns stored*511/447 - 1.2 as
        # coords in the 512-resized frame, and load_sample resizes the
        # 448-px img to 512 (coords scale 511/447) -> store the 448-frame
        # coords plus the offset compensation
        assert size == 448, "generator calibrated for Doc3D's 448px frame"
        stored = bm + 1.2 * (447.0 / 511.0)
        with h5py.File(os.path.join(d, "bm.mat"), "w") as f:
            f.create_dataset("bm", data=stored.transpose((2, 1, 0)),
                             compression="gzip", compression_opts=1)
        # recon.png is the idempotency sentinel — written LAST so a kill
        # mid-sample leaves a dir the next run regenerates rather than a
        # permanently incomplete one (bm.mat missing -> sample silently
        # dropped by make_doc3d_sample_list)
        cv2.imwrite(os.path.join(d, "recon.png"), mask)
    return root
