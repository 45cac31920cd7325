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

  # key the default dir by the host CPU's feature set: XLA:CPU AOT
  # executables are not portable across machine types (loading one built
  # with e.g. avx512/amx on a host without them aborts the process), and
  # home directories / tmp can outlive a machine swap
  try:
    flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
  except (OSError, IndexError):
    flags = ""
  import hashlib
  cpu_key = hashlib.md5(flags.encode()).hexdigest()[:10]
  path = raw or os.path.join(
      os.path.expanduser("~"), ".cache", "dynibar_tpu", f"jax_{cpu_key}")
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
