"""Host->device wire codec for training batches.

Shrinks the bytes each train step ships through ``device_put``.  Two
reasons, both measured on the v5e serving host (tunnel transport):

1. **Transfer time.** A raw float32 batch (image + mask + two full-res
   flows at batch 8) is ~67 MB/step; the slim wire is ~25 MB.
2. **Host-RSS leak.** The axon PJRT tunnel client retains every
   host->device transfer buffer for the life of the process (isolated:
   a bare ``device_put(np.ndarray)`` loop leaks exactly the transferred
   bytes; executions on device-resident data leak nothing; ``gc.collect``
   reclaims none of it).  Leak rate is therefore proportional to wire
   bytes — the 3k-step demo run at the raw wire grew ~85 MB/step and was
   OOM-killed at step 1460 on a 125 GB host.  See also
   ``run_training.py --segment_steps`` for hard-bounding long runs.

Encoding (host side, numpy):

* ``source_image`` float32 [0,1] -> uint8 (x255 round).  The compositing
  / color-jitter pipeline emits continuous values, so this quantizes by
  <=1/510 — the same 8-bit granularity the underlying PNG data had
  (intentional deviation from the reference's float tensors; the eval
  driver already ships uint8).  Exact for real 8-bit imagery.
* ``doc_mask`` float32 -> uint8 (x255 round), <=1/510 quantization on
  the warped mask's antialiased edges.
* ``flow_map`` (B,512,512,2) absolute offsets -> (B,latent,latent,2)
  via the SAME bilinear weights the device resize uses
  (``ops/resize._linear_weights``, align_corners=True).  The training
  step only consumes the latent-res flow (reference
  ``train_util.py:306-312`` downsamples it immediately), and bilinear
  resampling commutes with the later /(h-1) normalization, so this is
  the identical math reordered — ~1 ulp, not a quantization.
* ``flow_map_inter`` stays float32 full-res (the 512^2 composed-warp
  loss consumes it at full resolution).

Decoding happens inside the jitted ``train_loop.build_device_batch`` by
dtype/shape dispatch, so raw float32 batches (tools, tests, external
iterators) keep working unchanged.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from dvd_tpu.ops.resize import _linear_weights


def resize_bilinear_np(img: np.ndarray, size, align_corners: bool = True
                       ) -> np.ndarray:
    """Numpy twin of :func:`dvd_tpu.ops.resize.resize_bilinear` (NHWC /
    HWC), built from the same interpolation-weight matrices."""
    ho, wo = size
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (ho, wo):
        return img
    wh = _linear_weights(h, ho, align_corners)
    ww = _linear_weights(w, wo, align_corners)
    out = np.einsum("oh,...hwc->...owc", wh, img.astype(np.float32))
    return np.einsum("pw,...owc->...opc", ww, out)


def _to_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(x * 255.0), 0.0, 255.0).astype(np.uint8)


def encode_batch(raw: Dict[str, np.ndarray], latent: int
                 ) -> Dict[str, np.ndarray]:
    """Slim a host training batch for the wire (see module docstring)."""
    out = dict(raw)
    if raw["source_image"].dtype != np.uint8:
        out["source_image"] = _to_u8(raw["source_image"])
    if raw["doc_mask"].dtype != np.uint8:
        out["doc_mask"] = _to_u8(raw["doc_mask"])
    if raw["flow_map"].shape[1] != latent:
        out["flow_map"] = resize_bilinear_np(raw["flow_map"],
                                             (latent, latent))
    return out
