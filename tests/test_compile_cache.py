"""Compile-cache keying: incompatible runtimes must miss, never abort.

Round-3 incident: the cache dir was keyed by /proc/cpuinfo flags only, so
an entry written by a different jaxlib (whose embedded XLA target config
no longer matched the runtime) was *found* and the load ABORTED the
process.  The fingerprint now includes the jax + jaxlib versions, so a
runtime change selects a different directory — a clean miss.
"""

import jax
import jaxlib

from dynibar_tpu.utils import compile_cache


def test_fingerprint_changes_with_jaxlib_version(monkeypatch):
  base = compile_cache.cache_fingerprint()
  monkeypatch.setattr(jaxlib, "__version__", "0.0.0-doctored")
  assert compile_cache.cache_fingerprint() != base


def test_fingerprint_changes_with_jax_version(monkeypatch):
  base = compile_cache.cache_fingerprint()
  monkeypatch.setattr(jax, "__version__", "0.0.0-doctored")
  assert compile_cache.cache_fingerprint() != base


def test_fingerprint_stable_within_runtime():
  assert compile_cache.cache_fingerprint() == compile_cache.cache_fingerprint()


def test_enable_respects_disable_env(monkeypatch):
  monkeypatch.setenv("DYNIBAR_COMPILE_CACHE", "0")
  assert compile_cache.enable_compile_cache() is None


def test_enable_returns_test_harness_dir():
  # conftest pins the cache dir; enable() must not clobber it and the
  # pinned dir must embed the full fingerprint (not just cpu flags)
  d = compile_cache.enable_compile_cache()
  assert d == jax.config.jax_compilation_cache_dir
  assert compile_cache.cache_fingerprint() in d
