"""Test configuration: CPU backend with a virtual 8-device mesh, float64 on.

Tests validate numerics in float64 on CPU (fast, deterministic); the TPU path
uses the same dtype-polymorphic code in float32/bfloat16. The environment
pre-imports jax with the TPU platform, so we must override via jax.config
(env vars are too late) before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("VIBA_TEST_BACKEND") == "tpu":
    # TPU-accuracy tests (tests/test_tpu_accuracy.py, -m tpu): keep the real
    # backend and its native f32 — the point is to exercise the bf16/Pallas
    # fast paths that only engage on TPU.
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Persistent XLA compilation cache (repo-local, gitignored): the smoke
    # gate's cost is dominated by CPU compiles of the same kernels at the
    # same shapes on every run — measured 232 s -> 78 s for the golden-
    # session CLI alone. First run populates; every later gate run (driver
    # stall checks, pre-commit, judge re-runs) is warm. The cache key
    # includes jax/XLA versions and flags, so stale entries are misses, not
    # wrong results. TPU runs (VIBA_TEST_BACKEND=tpu) bypass this — the
    # axon remote compiler has its own server-side cache.
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
