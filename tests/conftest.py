"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
real TPU tunnel), so plain env-var assignment here is too late. jax.config
can still be updated after import as long as no backend has initialized,
and XLA_FLAGS is read at backend-init time.

Set XPOINT_TEST_TPU=1 to keep the real TPU backend instead (runs the
on-device Pallas-parity tests that are skipped on CPU; serialize with any
other TPU job — see .claude/skills/verify/SKILL.md).
"""
import os

if os.environ.get("XPOINT_TEST_TPU"):
    import jax  # noqa: F401
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
