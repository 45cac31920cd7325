"""Multi-scene session registry: one server process, many resident scenes.

The reference repo renders one scene per process (render_monocular_bt.py is
a one-shot batch script); a deployment serves a catalog.  The registry
lazily constructs one :class:`RenderSession` per scene named in
``config.train_scenes`` and keeps at most ``max_sessions`` resident
(LRU-evicted — each session pins featmaps and params on device).

Per-scene checkpoints follow the config's own layout: each session gets
``dataclasses.replace(config, train_scenes=[scene])``, so ``out_folder()``
resolves per scene exactly as training wrote it.  Injected ``params``
(tests, shared-weights deployments) are reused across scenes.
"""

from __future__ import annotations

import collections
import dataclasses
import threading
from typing import Any, Dict, List, Optional

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.serve.session import RenderSession


class SessionRegistry:
  """Lazily-built, LRU-bounded map scene name -> RenderSession."""

  def __init__(self, config: DynibarConfig, params: Any = None,
               featmap_cache: int = 8, max_sessions: int = 4):
    if not config.train_scenes:
      raise ValueError("config.train_scenes is empty")
    self.config = config
    self.available: List[str] = list(config.train_scenes)
    self._params = params
    self._featmap_cache = featmap_cache
    self._max_sessions = max_sessions
    self._sessions: "collections.OrderedDict[str, RenderSession]" = (
        collections.OrderedDict())
    self._lock = threading.Lock()
    self.default_scene = self.available[0]

  @classmethod
  def from_session(cls, session: RenderSession) -> "SessionRegistry":
    """Wrap an existing single session (compat path for callers that built
    a RenderSession themselves, e.g. with injected params)."""
    reg = cls(session.config, params=session.params,
              featmap_cache=session._cache_size, max_sessions=1)
    reg._sessions[reg.default_scene] = session
    return reg

  # ------------------------------------------------------------------ access
  def get(self, scene: Optional[str] = None) -> RenderSession:
    """The session for `scene` (default: first configured), building it on
    first use and evicting the least-recently-used session over capacity."""
    name = scene or self.default_scene
    if name not in self.available:
      raise KeyError(f"unknown scene {name!r}; available: {self.available}")
    with self._lock:
      if name in self._sessions:
        self._sessions.move_to_end(name)
        return self._sessions[name]
      cfg = dataclasses.replace(self.config, train_scenes=[name])
      session = RenderSession(cfg, params=self._params,
                              featmap_cache=self._featmap_cache)
      self._sessions[name] = session
      while len(self._sessions) > self._max_sessions:
        self._sessions.popitem(last=False)
      return session

  # ------------------------------------------------------------------- meta
  def scenes(self) -> Dict[str, Any]:
    with self._lock:
      loaded = list(self._sessions)
    return {"available": self.available, "loaded": loaded,
            "default": self.default_scene,
            "max_sessions": self._max_sessions}
