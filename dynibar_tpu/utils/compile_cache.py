"""Persistent XLA compilation cache for the production entry points.

First compilation of the full render/train program through a remote-TPU
tunnel takes 5-15 minutes; the persistent cache makes every later process
start (train resume, eval re-run, serving restart, bench) hit disk instead
of the compiler.  The reference has no analog (torch eager recompiles
nothing, but also caches nothing); this is a TPU-operations concern.

Call :func:`enable_compile_cache` once, before the first jit execution.
Controlled by environment:

  DYNIBAR_COMPILE_CACHE       cache directory (default
                              ~/.cache/dynibar_tpu/jax); "0"/"off" disables
  DYNIBAR_COMPILE_CACHE_MIN   min seconds of compile time worth caching
                              (default 2.0)
"""

from __future__ import annotations

import os

_ENABLED = False


def cache_fingerprint() -> str:
  """Fingerprint that must change whenever cached XLA:CPU executables stop
  being loadable: the host CPU's feature flags (AOT code built with e.g.
  avx512/amx aborts the process on a host without them) AND the
  jax/jaxlib versions (an entry's embedded XLA target config — the LLVM
  feature string like ``+prefer-no-scatter,...`` — is checked against the
  *current* runtime's, and a mismatch aborts rather than misses).  Keying
  the cache DIRECTORY by all of these turns every incompatibility into a
  clean miss: a different runtime simply looks in a different directory.
  """
  import hashlib

  import jax
  import jaxlib

  try:
    flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
  except (OSError, IndexError):
    flags = ""
  blob = "\n".join([flags, jax.__version__, jaxlib.__version__])
  return hashlib.md5(blob.encode()).hexdigest()[:10]


def enable_compile_cache() -> str | None:
  """Idempotently enable the persistent compilation cache.

  Returns the cache directory, or None when disabled (or when a test
  harness already configured one — the tests pin their own directory).
  """
  from dynibar_tpu.utils.platform import pin_platform_from_env
  pin_platform_from_env()

  global _ENABLED
  raw = os.environ.get("DYNIBAR_COMPILE_CACHE", "")
  if raw.lower() in ("0", "off", "false", "none"):
    return None

  import jax

  if _ENABLED or jax.config.jax_compilation_cache_dir:
    return jax.config.jax_compilation_cache_dir

  # key the default dir by host CPU features + jax/jaxlib versions so an
  # incompatible entry is a clean miss, never an abort (cache_fingerprint)
  path = raw or os.path.join(
      os.path.expanduser("~"), ".cache", "dynibar_tpu",
      f"jax_{cache_fingerprint()}")
  try:
    os.makedirs(path, exist_ok=True)
  except OSError:
    return None
  jax.config.update("jax_compilation_cache_dir", path)
  jax.config.update(
      "jax_persistent_cache_min_compile_time_secs",
      float(os.environ.get("DYNIBAR_COMPILE_CACHE_MIN", "2.0")))
  _ENABLED = True
  return path
