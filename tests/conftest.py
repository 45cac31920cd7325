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

import jax  # noqa: E402

if not _TPU_MODE:
  jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persist compiled executables across pytest runs (single-core compiles).
# The cache dir is keyed by host CPU features + jax/jaxlib versions
# (utils/compile_cache.cache_fingerprint): XLA:CPU AOT executables are
# NOT portable across machine types OR runtimes — loading an entry whose
# embedded target config mismatches the current jaxlib aborts the process
# instead of missing — and /tmp can survive a machine swap.
from dynibar_tpu.utils.compile_cache import cache_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_dynibar_tests_{cache_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if not _TPU_MODE:
  assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
