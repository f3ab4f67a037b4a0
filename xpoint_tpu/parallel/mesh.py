"""Device mesh + sharding helpers.

The reference's only parallelism is single-host torch DataParallel
(SURVEY.md §2.11); the TPU-native equivalent is batch-sharded data
parallelism over a 1-D jax.sharding.Mesh of the ICI-connected chips, with
gradient all-reduce inserted automatically by GSPMD under jit. BatchNorm
reductions also become global (sync-BN) for free because the batch axis is
a sharded named axis inside one jit program.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the first n devices.

    Raises if fewer than n_devices are available — silently truncating
    would make every downstream "multi-chip" check pass vacuously on a
    single chip.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: asked for {n_devices} devices but only "
                f"{len(devices)} available ({jax.default_backend()} backend). "
                "For a virtual mesh set JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                "before jax initializes.")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch, mesh):
    """Place a pytree of host arrays batch-sharded over the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(pytree, mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), pytree)
