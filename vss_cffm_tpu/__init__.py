"""vss_cffm_tpu — a TPU-native video semantic segmentation framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
CFFM (CVPR 2022) and CFFM++ (TPAMI 2024) video semantic segmentation:
SegFormer (MiT) backbones, per-frame MLP decoders, the coarse-to-fine
cross-frame focal attention decoder, and the global-temporal-context
(k-means prototype) refinement — re-designed for TPU:

- NHWC layouts, bf16 compute / f32 params, static shapes everywhere.
- Bilinear resizes expressed as dense matmuls (MXU) with exact PyTorch
  ``align_corners=False`` semantics.
- The CFFM attention's roll/unfold K/V assembly is precomputed into static
  gather indices at trace time; the attention itself is a single batched
  einsum (optionally a fused Pallas kernel).
- Data-parallel training over a ``jax.sharding.Mesh``; cross-device batch
  norm and loss reduction happen through XLA collectives inserted by GSPMD.
"""

__version__ = "0.1.0"
