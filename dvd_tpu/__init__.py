"""dvd_tpu — a TPU-native document-dewarping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
DvD reference ("Document Dewarping via Diffusion", hanquansanren/DvD):
coordinate-level denoising diffusion over a 64x64 backward-map field,
conditioned on document-segmentation / text-line / image features, with
a fused bilinear-warp unwarping path, batched TPU inference, and
data-parallel (+ optional tensor-parallel) training over a jax.sharding
Mesh.

Layout
------
- ``dvd_tpu.config``      typed configuration (flag parity with the
  reference's ``admin/local.py`` generated-file flag system)
- ``dvd_tpu.utils``       coordinate grids / conventions, image IO, logging
- ``dvd_tpu.ops``         torch-parity resize / grid_sample (+ Pallas kernels)
- ``dvd_tpu.diffusion``   schedules, q/p math, DDIM sampler, losses
- ``dvd_tpu.models``      DiT denoiser, SATRN fusion decoder, aux nets
  (U2NetP doc-seg, GeoTr, text-line UNet, VGG pyramid), alt denoisers
- ``dvd_tpu.parallel``    mesh + sharding rules
- ``dvd_tpu.training``    train step, optimizer/EMA, checkpointing
- ``dvd_tpu.data``        dataset pipelines (Doc3D training, benchmark eval)
- ``dvd_tpu.evaluation``  benchmark drivers + MS-SSIM/LD metrics
"""

__version__ = "0.1.0"
