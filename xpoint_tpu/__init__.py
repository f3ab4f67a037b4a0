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

# Opt-in persistent XLA compilation cache (XPOINT_JAX_CACHE=<dir>): the
# CLI subprocesses in the test suite and the multichip dryrun share one
# cache so repeated XLA-CPU compiles — the wall-time pole on 1-core
# containers — are paid once. Env-gated so plain library use is untouched.
import os as _os

if _os.environ.get("XPOINT_JAX_CACHE"):
    try:
        import jax as _jax
        _os.makedirs(_os.environ["XPOINT_JAX_CACHE"], exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["XPOINT_JAX_CACHE"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:               # never let cache plumbing break imports
        pass
