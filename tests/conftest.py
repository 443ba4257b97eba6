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

import jax  # noqa: E402

if not _USE_TPU:
    # This image's TPU plugin ignores JAX_PLATFORMS; force CPU via config too.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
