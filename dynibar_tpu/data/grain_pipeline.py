"""Grain-backed input pipeline (optional alternative to data/pipeline.py).

The reference feeds training with torch DataLoader worker processes
(train.py:82-90); this module provides the Grain equivalent: an
index-seeded IterDataset over the scene provider with multiprocess
prefetching, giving deterministic, resumable sample streams (each index
maps to one RandomState, so step N always yields the same batch for a given
seed — unlike the reference, whose worker seeding made runs irreproducible
by design, SURVEY.md §5).

Usage:
    loader = make_grain_loader(provider, n_rays=3072, seed=0,
                               num_workers=4)
    for batch in loader: ...
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np


class _SampleSource:
  """Infinite-ish index-based source: index -> deterministic batch."""

  def __init__(self, provider, n_rays: int, sample_mode: str, seed: int,
               length: int = 10_000_000):
    self._provider = provider
    self._n_rays = n_rays
    self._sample_mode = sample_mode
    self._seed = seed
    self._length = length

  def __len__(self) -> int:
    return self._length

  def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(
        (self._seed * 1_000_003 + index) % (2 ** 31 - 1))
    return self._provider.sample_batch(rng, self._n_rays, self._sample_mode)


def make_grain_loader(provider, n_rays: int, sample_mode: str = "uniform",
                      seed: int = 0, num_workers: int = 0,
                      prefetch: int = 4) -> Iterator[Dict[str, np.ndarray]]:
  """Build a Grain DataLoader over a scene provider.

  Falls back to a plain generator when grain is unavailable.
  """
  source = _SampleSource(provider, n_rays, sample_mode, seed)
  try:
    import grain.python as grain
  except Exception:
    def _gen():
      i = 0
      while True:
        yield source[i]
        i += 1
    return _gen()

  sampler = grain.IndexSampler(
      num_records=len(source), shard_options=grain.NoSharding(),
      shuffle=False, num_epochs=1, seed=seed)
  loader = grain.DataLoader(
      data_source=source, sampler=sampler,
      operations=[],
      worker_count=num_workers,
      read_options=grain.ReadOptions(prefetch_buffer_size=prefetch))
  return iter(loader)
