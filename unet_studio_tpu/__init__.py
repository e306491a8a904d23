"""unet_studio_tpu — a TPU-native 3D U-Net segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
frankyeh/UNet-Studio (C++/LibTorch/CUDA desktop app): template-based
training of 3D U-Nets for brain segmentation with on-device MR-contrast
simulation and visual-perception augmentation, zoo-compatible `.nz`
model serialization, NIfTI I/O, and a CLI with train/evaluate/qc actions.

Design stance: compute lives in jitted, shardable JAX functions over a
`jax.sharding.Mesh`; augmentation runs on device inside the train step;
host code only orchestrates files and metadata.
"""

__version__ = "0.1.0"
