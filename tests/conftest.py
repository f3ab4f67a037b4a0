"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite works without TPU hardware and exercises multi-chip sharding.

Must override JAX_PLATFORMS (the environment presets the TPU 'axon' platform)
before jax is imported anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
