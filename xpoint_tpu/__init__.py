"""XPoint-TPU: a TPU-native JAX/XLA/Pallas framework for self-supervised
multispectral image registration.

Re-designed from scratch for TPU with the capabilities of the reference
XPoint framework (SuperPoint-style detector/descriptor with a VMamba
visual-state-space encoder, homographic-adaptation self-supervision, and
a full registration/evaluation pipeline).

Layout:
    ops/        jit-fusable device ops (warp, NMS, selective scan, matching)
    models/     flax.linen model definitions (XPoint, VSSM, SwinV2, RegNet, ...)
    geometry/   homography sampling / RANSAC (host + device)
    data/       datasets (HDF5/folder pairs, synthetic shapes) + augmentation
    losses/     detector / descriptor / homography-regression losses
    selfsup/    homographic adaptation pseudo-ground-truth engine
    eval/       repeatability / descriptor / homography metrics + timing
    parallel/   jax.sharding mesh + pjit train/infer step builders
    utils/      config & misc helpers
    compat/     PyTorch checkpoint -> JAX parameter converter
"""

__version__ = "0.1.0"
