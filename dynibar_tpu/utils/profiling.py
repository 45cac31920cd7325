"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5: wall-clock prints only, TorchScript
profiling explicitly disabled).  This framework provides:

  * :func:`trace` — context manager around ``jax.profiler`` trace capture
    (view in TensorBoard's profile tab or xprof);
  * :class:`PhaseTimer` — lightweight named-phase wall timers with
    device-sync option, for the per-step breakdowns the train loop prints;
  * :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so host-side
    phases show up inside device traces.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
  """Capture a jax.profiler trace for the enclosed region."""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate(name: str):
  """Named region that appears in profiler timelines."""
  return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
  """Accumulates wall time per named phase.

  Note: on backends where ``block_until_ready`` does not fence remote
  execution, pass a small array and use ``sync='value'`` to force a host
  transfer at phase end (see .claude/skills/verify/SKILL.md).
  """

  def __init__(self, sync: str = "none"):
    self._sync = sync
    self.totals: Dict[str, float] = collections.defaultdict(float)
    self.counts: Dict[str, int] = collections.defaultdict(int)

  @contextlib.contextmanager
  def phase(self, name: str, sync_value=None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    if sync_value is not None:
      if self._sync == "value":
        jax.device_get(sync_value)
      elif self._sync == "ready":
        jax.block_until_ready(sync_value)
    self.totals[name] += time.perf_counter() - t0
    self.counts[name] += 1

  def summary(self) -> Dict[str, float]:
    return {k: self.totals[k] / max(1, self.counts[k]) for k in self.totals}

  def reset(self):
    self.totals.clear()
    self.counts.clear()
