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

    # Persistent compilation cache shared with __graft_entry__'s dryrun:
    # XLA-CPU compiles of the larger test models dominate suite wall time
    # on this 1-core container; repeat runs hit the cache and skip them.
    _cache = os.environ.get("XPOINT_JAX_CACHE", "/tmp/xpoint_jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
