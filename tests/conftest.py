"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax is imported anywhere.
"""
import os

_USE_TPU = os.environ.get("M3P2I_TEST_TPU", "") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The persistent compilation cache holds XLA:CPU AOT entries compiled
    # with other machines' feature sets; every lookup then logs a
    # cpu_aot_loader feature-mismatch error (pure spam — the load fails and
    # the test recompiles anyway).  Disable it for CPU test runs.
    os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

import jax  # noqa: E402

if not _USE_TPU:
    # This image's TPU plugin ignores JAX_PLATFORMS; force CPU via config too.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_enable_compilation_cache", False)
    except Exception:
        pass  # older jax: the env var above covers it
jax.config.update("jax_enable_x64", False)
