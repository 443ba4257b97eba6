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
    # Compilation dominates the suite's wall time on this 1-core host
    # (~45 of ~48 min are jit compiles).  The DEFAULT persistent cache is
    # useless here: it holds XLA:CPU AOT entries compiled with other
    # machines' feature sets, so every lookup logs a cpu_aot_loader
    # feature-mismatch error and recompiles anyway.  Point the cache at a
    # repo-local dir instead (gitignored): the first run populates it with
    # THIS host's entries and every rerun loads them — warm full-suite runs
    # drop to minutes.
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )

import jax  # noqa: E402

if not _USE_TPU:
    # This image's TPU plugin ignores JAX_PLATFORMS; force CPU via config too.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        # cache every compile, not just the >1 s ones (the suite's cost is
        # the long tail of mid-size programs)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # older jax: the env var above covers it
jax.config.update("jax_enable_x64", False)
