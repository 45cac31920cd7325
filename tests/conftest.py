"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
on the local CPU backend with 8 virtual devices so mesh-sharded code is
testable without TPU hardware (SURVEY.md §4).  XLA_FLAGS must be set before
jax initializes a backend; the platform override goes through jax.config
because the axon plugin wins the env-var race otherwise.
"""

import os

# opt-in TPU mode: DYNIBAR_TPU_TESTS=1 keeps the real accelerator backend so
# tpu-gated tests (compiled-kernel parity) run; everything else skips itself
# off-cpu or runs fine on the accelerator
_TPU_MODE = os.environ.get("DYNIBAR_TPU_TESTS", "0") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import hashlib  # noqa: E402

import jax  # noqa: E402

if not _TPU_MODE:
  jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persist compiled executables across pytest runs (single-core compiles).
# The cache dir is keyed by the host CPU's feature set: XLA:CPU AOT
# executables are NOT portable across machine types (loading one compiled
# with e.g. avx512/amx on a host without them aborts the process), and
# /tmp can survive a machine swap.
try:
  _flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
except (OSError, IndexError):
  _flags = ""
_cpu_key = hashlib.md5(_flags.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_dynibar_tests_{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if not _TPU_MODE:
  assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
