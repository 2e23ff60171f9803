"""Synthetic Doc3D-format dataset: internal consistency + on-disk round
trip through the production loaders (load_sample / load_bm_mat /
Doc3DDataset)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dvd_tpu.data.doc3d import (Doc3DDataset, bilinear_warp_np, load_sample,
                                make_doc3d_sample_list)
from dvd_tpu.data.synthetic import make_synthetic_sample, write_synthetic_doc3d


def _masked_corr(a, b, m):
    a = a[m].astype(np.float64).ravel()
    b = b[m].astype(np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    den = np.sqrt((a**2).sum() * (b**2).sum())
    return float((a * b).sum() / den) if den else 0.0


def test_sample_unwarps_back_to_flat_doc():
    img, bm, mask = make_synthetic_sample(448, seed=3)
    assert img.shape == (448, 448, 3) and bm.shape == (448, 448, 2)
    assert mask.mean() > 100  # page covers most of the frame
    # unwarping the photo by the backward map must recover the flat doc
    flat = bilinear_warp_np(img.astype(np.float32), bm)
    from dvd_tpu.evaluation.calibrate import render_document

    doc_g = render_document(448, 448, 3)
    flat_g = flat.mean(-1)
    interior = np.zeros((448, 448), bool)
    interior[40:-40, 40:-40] = True
    # bilinear resampling blurs glyph edges, so ~0.9 is the practical
    # ceiling for text imagery; anything below ~0.7 would mean the bm
    # inversion is wrong (mis-registered text decorrelates fast)
    c = _masked_corr(flat_g, doc_g, interior)
    assert c > 0.85, c


def test_on_disk_round_trip_through_production_loader(tmp_path):
    root = write_synthetic_doc3d(str(tmp_path), n=2, seed=7)
    samples = make_doc3d_sample_list(root, split_ratio=1.0)
    assert len(samples) == 2
    img512, bm512, mask512 = load_sample(*samples[0])
    assert img512.shape == (512, 512, 3) and bm512.shape == (512, 512, 2)
    assert mask512.max() == 255
    # bm coords live in the 512 frame and unwarp the resized photo
    assert -2.0 < bm512.min() and bm512.max() < 513.0
    flat = bilinear_warp_np(img512.astype(np.float32), bm512)
    assert flat[100:-100, 100:-100].mean() > 80  # page content, not border

    ds = Doc3DDataset(samples=samples)
    out = ds.__getitem__(0, seed=5)
    for k in ("source_image", "doc_mask", "flow_map", "flow_map_inter"):
        assert k in out, k
    assert out["source_image"].shape == (512, 512, 3)
    assert np.isfinite(out["flow_map"]).all()


def test_prefetched_batches_propagates_errors():
    """A producer exception (unreadable image) must surface in the
    consumer instead of hanging the driver on Queue.get() forever."""
    import pytest

    from dvd_tpu.evaluation.driver import prefetched_batches

    class GoodThenBad:
        def batches(self, bs):
            yield {"count": bs}
            raise IOError("unreadable image /x.png")

    it = prefetched_batches(GoodThenBad(), 2)
    assert next(it)["count"] == 2
    with pytest.raises(IOError, match="unreadable"):
        next(it)


def test_prefetched_batches_order_and_termination():
    from dvd_tpu.evaluation.driver import prefetched_batches

    class DS:
        def batches(self, bs):
            for i in range(5):
                yield {"i": i}

    got = [b["i"] for b in prefetched_batches(DS(), 1)]
    assert got == [0, 1, 2, 3, 4]


def test_loader_refuses_sub_batch_local_slice():
    """drop_last with fewer local samples than a batch used to busy-spin
    the producer while the consumer hung on q.get() forever."""
    import pytest

    from dvd_tpu.data.loader import PrefetchLoader

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i, seed=0):
            return {"x": np.zeros((2,), np.float32)}

    with pytest.raises(ValueError, match="samples < batch_size"):
        PrefetchLoader(DS(), batch_size=10, num_workers=1)
    # multi-host: 12 globally but 6 per process
    with pytest.raises(ValueError, match="samples < batch_size"):
        PrefetchLoader(_Sized12(), batch_size=10, num_workers=1,
                       process_index=0, process_count=2)


class _Sized12:
    def __len__(self):
        return 12

    def __getitem__(self, i, seed=0):
        return {"x": np.zeros((2,), np.float32)}


def test_synthetic_manifest_regenerates_on_seed_change(tmp_path):
    import json

    from dvd_tpu.data.synthetic import write_synthetic_doc3d

    root = str(tmp_path / "syn")
    write_synthetic_doc3d(root, 1, seed=1)
    import cv2
    img1 = cv2.imread(f"{root}/syn_00000/img.png")
    # same seed: no regeneration (mtime-insensitive check via content)
    write_synthetic_doc3d(root, 1, seed=1)
    assert (cv2.imread(f"{root}/syn_00000/img.png") == img1).all()
    # new seed: stale samples are replaced, not silently reused
    write_synthetic_doc3d(root, 1, seed=2)
    img2 = cv2.imread(f"{root}/syn_00000/img.png")
    assert not (img2 == img1).all()
    assert json.load(open(f"{root}/synthetic_manifest.json"))["seed"] == 2
