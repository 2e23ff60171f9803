"""The warped_BM.npz training-dataset family (``dataset_name='doc_debug'``
/ ``'aug_doc'``).

Behavioral parity with the reference's npz-flow path:

- sample discovery: per-sample dirs with ``warped_document.png`` /
  ``warped_BM.npz`` / ``warped_recon.png``, 0.97 default split
  (``datasets/load_pre_made_dataset.py:21-32,83-133``)
- ``load_gt_flow_npz`` (``utils_data/io.py:167-197``): the stored
  ``warped_BM`` array is (448, 448, 2) in [0, 1], y-channel first; the
  loader crops to 447, scales ``*511 + 0.4`` (the npz family's
  load-bearing fudge factors — DIFFERENT from the bm.mat path's
  ``*511/447 - 1.2``), per-channel cv2-resizes to 512^2, then rolls the
  channel axis so x comes first
- ``Doc_Dataset`` -> basic ``ListDataset`` (``listdataset.py:121-291``):
  no augmentation; outputs source image [0,1], recon-threshold doc mask,
  and ``flow = bm - base`` absolute offsets
- ``Aug_Doc_Dataset`` -> ``Aug_ListDataset`` (``listdataset.py:293-470``):
  structurally identical to the production ``Aug_Doc3d_ListDataset``
  (tight crop + bg compositing + intermediate warp + color jitter) with
  the npz loader swapped in — realized here by parameterizing
  ``Doc3DDataset.load_fn``

Documented upstream breakages (kept out of scope, mirrored in STATUS.md):

- ``train_TDiff.py:6`` imports ``Mix_Dataset``, a symbol that exists only
  in a stale ``.pyc`` — no ``.py`` in the reference defines it, so the
  import would fail on a clean checkout; not a buildable component.
- The basic ``ListDataset`` subtracts a 448^2 coordinate grid
  (``listdataset.py:219``) from the 512^2 bm that the *current*
  ``load_gt_flow_npz`` returns — a shape mismatch that raises upstream
  (the grid predates the loader's in-function 512 resize).  We compute
  ``flow = bm - base`` at the common 512^2 resolution, which is what the
  stale code unambiguously intended (its own flow_transform comment
  rescales 448-frame flows by 512/448 to the same place).
- The basic family emits no ``flow_map_inter``; the reference's live loss
  variants all slice ``batch_ori_inter`` unconditionally
  (``train_util.py:373,418,467`` — None would crash).  We emit zeros,
  which is exactly what the aug families produce at their production
  ``t = 0`` interpolation anyway.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from dvd_tpu.data.doc3d import (Doc3DDataset, base_grid_abs, cv2,
                                _require_cv2)


# ---------------------------------------------------------------- discovery


def make_doc_sample_list(root: str, split: str = "train",
                         split_ratio: float = 0.97
                         ) -> List[Tuple[str, str, str]]:
    """Per-sample dirs with warped_document.png / warped_BM.npz /
    warped_recon.png (reference ``load_pre_made_dataset.py:21-32``)."""
    entries = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        img = os.path.join(d, "warped_document.png")
        bm = os.path.join(d, "warped_BM.npz")
        recon = os.path.join(d, "warped_recon.png")
        if os.path.isfile(img) and os.path.isfile(bm) and os.path.isfile(recon):
            entries.append((img, bm, recon))
    cut = int(len(entries) * split_ratio)
    return entries[:cut] if split == "train" else entries[cut:]


# ------------------------------------------------------------------ loaders


def load_bm_npz(path: str, out_size: int = 512) -> np.ndarray:
    """warped_BM.npz -> (512, 512, 2) float absolute backward map, x first
    (reference ``load_gt_flow_npz``, io.py:167-197: crop 447, *511 + 0.4,
    per-channel resize, axis roll y->x).  Bad files raise instead of the
    reference's print-and-return-garbage."""
    _require_cv2()
    bm = np.load(path)["warped_BM"][:447, :447, :] * 511.0 + 0.4
    bm0 = cv2.resize(bm[:, :, 0], (out_size, out_size))
    bm1 = cv2.resize(bm[:, :, 1], (out_size, out_size))
    bm = np.stack([bm0, bm1], axis=-1)
    return np.roll(bm, shift=1, axis=-1)


def load_sample_npz(img_path: str, bm_path: str, recon_path: str
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (img 512^2 RGB uint8, bm 512^2 float, mask 512^2 uint8 0/255)
    (reference ``default_loader2``, listdataset.py:52-74)."""
    _require_cv2()
    img = cv2.imread(img_path, 1)
    abd = cv2.imread(recon_path, cv2.IMREAD_GRAYSCALE)
    if img is None or abd is None:
        raise IOError(f"unreadable sample {img_path} / {recon_path}")
    img = img[:, :, ::-1].astype(np.uint8)
    _, mask = cv2.threshold(abd.astype(np.uint8), 1, 255, cv2.THRESH_BINARY)
    return (cv2.resize(img, (512, 512)), load_bm_npz(bm_path),
            cv2.resize(mask, (512, 512)))


# ----------------------------------------------------------------- datasets


class DocNpzDataset:
    """Basic ListDataset equivalent (``dataset_name='doc_debug'``): no
    augmentation, no intermediate warp (reference listdataset.py:121-291;
    see module docstring for the upstream base-grid breakage)."""

    def __init__(self, samples: Sequence[Tuple[str, str, str]]):
        self.samples = samples

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int, seed=None):
        img, bm, mask = load_sample_npz(*self.samples[index])
        base = base_grid_abs(512)
        flow = (bm - base).astype(np.float32)
        return {
            "source_image": (img / 255.0).astype(np.float32),
            "doc_mask": (mask.reshape(512, 512, 1) / 255.0).astype(np.float32),
            "flow_map": flow,
            "flow_map_inter": np.zeros_like(flow),
        }


def AugDocNpzDataset(samples, textures=(), **kw) -> Doc3DDataset:
    """Aug_ListDataset equivalent (``dataset_name='aug_doc'``): the shared
    augmentation pipeline with the npz loader (listdataset.py:293-470)."""
    return Doc3DDataset(samples=samples, textures=textures,
                        load_fn=load_sample_npz, **kw)


# ---------------------------------------------------------------- synthetic


def write_synthetic_doc_npz(root: str, n: int, seed: int = 0) -> str:
    """Synthetic dataset in the npz family's on-disk layout, reusing the
    Doc3D synthetic warp generator.  ``warped_BM`` is stored the way
    ``load_bm_npz`` reads it: (448, 448, 2) in [0, 1], y first — i.e. the
    inverse of the crop/scale/roll transform."""
    from dvd_tpu.data.synthetic import make_synthetic_sample

    _require_cv2()
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        d = os.path.join(root, f"syn_{i:05d}")
        if os.path.isfile(os.path.join(d, "warped_recon.png")):
            continue
        os.makedirs(d, exist_ok=True)
        img, bm, mask = make_synthetic_sample(448, seed=seed * 100003 + i)
        # bm is x-first absolute 448-frame coords.  The loader computes
        # stored*511 + 0.4 (values -> 512-frame coords; the 447->512
        # cv2.resize only remaps the spatial grid, not the values), and
        # the intended 512-frame coords are bm*(511/447) — the same
        # convention write_synthetic_doc3d uses for the mat path.  So
        # stored = (bm*(511/447) - 0.4)/511 = bm/447 - 0.4/511, y first.
        stored = np.roll(bm / 447.0 - 0.4 / 511.0, shift=1, axis=-1)
        np.savez_compressed(os.path.join(d, "warped_BM.npz"),
                            warped_BM=stored.astype(np.float32))
        cv2.imwrite(os.path.join(d, "warped_document.png"), img[:, :, ::-1])
        cv2.imwrite(os.path.join(d, "warped_recon.png"), mask)
    return root
