"""Host-side input pipeline: threaded prefetch of device-ready ray batches.

Replaces the reference's torch DataLoader worker-process pool
(train.py:82-90, 16 workers, pin_memory) with a thread pool that decodes
images / flows / masks and *pre-transfers* each fixed-shape batch to device
while the previous step computes — the TPU analog of pinned-memory overlap.
Threads (not processes) suffice because the decode path is numpy/cv2 which
release the GIL, and nothing here touches JAX tracing.

Per-worker RNG streams replace the reference's worker seeding
(train.py:31-32,85); unlike the reference — whose second worker_init_fn
overrides the first with an unseeded np.random.seed(), making sampling
non-reproducible by design (SURVEY.md §5) — streams here derive
deterministically from (seed, worker_id, step).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np


class PrefetchPipeline:
  """Prefetches `sample_fn(rng)` results onto device with N worker threads."""

  def __init__(self, sample_fn: Callable[[np.random.RandomState],
                                         Dict[str, np.ndarray]],
               num_workers: int = 2, prefetch_depth: int = 4,
               seed: int = 0, device_put: bool = True,
               sharding: Optional[Any] = None):
    self._sample_fn = sample_fn
    self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch_depth)
    self._stop = threading.Event()
    self._seed = seed
    self._device_put = device_put
    self._sharding = sharding
    self._threads = [
        threading.Thread(target=self._worker, args=(wid,), daemon=True)
        for wid in range(max(1, num_workers))
    ]
    self._counters = [0] * max(1, num_workers)
    for t in self._threads:
      t.start()

  def _worker(self, wid: int):
    step = 0
    while not self._stop.is_set():
      rng = np.random.RandomState(
          (self._seed * 1_000_003 + wid * 7919 + step) % (2 ** 31 - 1))
      try:
        batch = self._sample_fn(rng)
      except Exception as exc:  # surface loader errors to the consumer
        self._queue.put(exc)
        return
      if self._device_put:
        if self._sharding is not None:
          batch = {k: jax.device_put(v, self._sharding.get(k))
                   if self._sharding.get(k) is not None
                   else jax.device_put(v) for k, v in batch.items()}
        else:
          batch = jax.device_put(batch)
      # block while queue full; bail out promptly on stop
      while not self._stop.is_set():
        try:
          self._queue.put(batch, timeout=0.5)
          break
        except queue.Full:
          continue
      step += 1

  def __iter__(self) -> Iterator[Dict[str, Any]]:
    return self

  def __next__(self) -> Dict[str, Any]:
    item = self._queue.get()
    if isinstance(item, Exception):
      raise item
    return item

  def close(self):
    self._stop.set()
    for t in self._threads:
      t.join(timeout=2.0)

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
    return False
