"""Resident render state: checkpoint + scene + warm feature maps.

The offline CLI (cli/render_monocular.py, rebuilding the reference's
render_monocular_bt.py) re-runs the feature net and re-selects source views
for every output frame.  A serving process amortizes all of that:

  * the checkpoint is loaded once;
  * per-frame source stacks and their feature maps are computed on first
    use and kept in a small LRU cache on device (a frame's sources depend
    only on the frame index, not on the requested camera);
  * the chunk renderers are jit-cached (render/render_image.py) so new
    camera poses never recompile as long as the chunk shape is stable.

Thread-safe for one concurrent render (a lock serializes device work;
HTTP threads queue).
"""

from __future__ import annotations

import collections
import threading
import time
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.core.cameras import make_camera
from dynibar_tpu.data.monocular import MonocularSceneData
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                             render_image_mono)
from dynibar_tpu.utils import checkpoints as ckpt_lib


class RenderSession:
  """One scene + one checkpoint, resident on device.

  Args:
    config: system config (folder_path/train_scenes select the scene).
    params: parameter pytree; if None, loaded from the config's checkpoint.
    featmap_cache: number of frames whose source stacks + feature maps stay
      resident (a frame costs ~V x Hf x Wf x C x 2 entries).
  """

  def __init__(self, config: DynibarConfig, params: Any = None,
               featmap_cache: int = 8):
    self.config = config
    scene = config.train_scenes[0]
    self.data = MonocularSceneData(config, scene)
    config.num_frames = self.data.num_frames
    self.cfg = config.render_settings("mono")
    self.model = MonoModel(cfg=self.cfg, num_frames=self.data.num_frames)
    self.step = 0
    if params is None:
      payload, self.step = ckpt_lib.resume_from(config.out_folder(),
                                                config.ckpt_path)
      if payload is None:
        raise FileNotFoundError(
            f"no checkpoint under {config.out_folder()!r}")
      params = payload["params"]
    self.params = params

    # multi-chip serving: shard each frame's ray chunks over the mesh
    # (config.mesh_shape, same semantics as the training drivers)
    from dynibar_tpu.parallel.mesh import training_mesh
    self.mesh = training_mesh(config)

    probe = self.data._load_rgb(0)
    self.height, self.width = int(probe.shape[0]), int(probe.shape[1])

    self._lock = threading.Lock()
    self._cache_size = featmap_cache
    self._frames: "collections.OrderedDict[int, Dict[str, Any]]" = (
        collections.OrderedDict())
    self._rng = np.random.RandomState(0)
    self.stats = collections.Counter()
    self.timings: Dict[str, float] = collections.defaultdict(float)

  # ----------------------------------------------------------------- frames
  def _frame_state(self, idx: int) -> Dict[str, Any]:
    """Source stacks + device feature maps for frame `idx` (LRU-cached)."""
    if idx in self._frames:
      self._frames.move_to_end(idx)
      self.stats["featmap_cache_hits"] += 1
      return self._frames[idx]
    self.stats["featmap_cache_misses"] += 1
    t0 = time.perf_counter()
    from dynibar_tpu.cli.render_monocular import render_batch_template
    template = render_batch_template(self.data, idx,
                                     self.config.num_source_views,
                                     self.config.num_vv, self._rng)
    rb = {k: jnp.asarray(v) for k, v in template.items()}
    dy, _ = self.model.apply_feature(self.params, rb["src_rgbs"])
    st, _ = self.model.apply_feature_st(self.params, rb["static_src_rgbs"])
    state = {"template": rb, "featmaps": (dy, None, st)}
    self._frames[idx] = state
    while len(self._frames) > self._cache_size:
      self._frames.popitem(last=False)
    self.timings["featmap_s"] += time.perf_counter() - t0
    return state

  # ----------------------------------------------------------------- render
  def render(self, c2w: np.ndarray, frame_idx: int,
             h: Optional[int] = None, w: Optional[int] = None,
             intrinsics: Optional[np.ndarray] = None,
             stride: int = 1, layers: bool = False
             ) -> Dict[str, np.ndarray]:
    """Render one view.

    Args:
      c2w: [4,4] (or [3,4]) camera-to-world pose in the scene's convention.
      frame_idx: video time to render (clamped to the trainable window,
        same as cli/render_monocular.py).
      h/w/intrinsics: target camera; default to the scene's.
      stride: render every `stride`-th pixel (fast previews).
      layers: include the dynamic-only and static-only composites.

    Returns dict with 'rgb' [H,W,3] float32 in [0,1], 'depth' [H,W], and
    optionally 'rgb_dy'/'rgb_st'.
    """
    idx = int(np.clip(frame_idx, 3, self.data.num_frames - 4))
    h = int(h or self.height)
    w = int(w or self.width)
    intr = np.asarray(intrinsics if intrinsics is not None
                      else self.data.intrinsics[idx], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:np.asarray(c2w).shape[0]] = np.asarray(c2w, np.float32)
    camera = jnp.asarray(make_camera(h, w, intr, pose))

    with self._lock:
      t0 = time.perf_counter()
      state = self._frame_state(idx)
      rb = full_image_ray_batch(state["template"], camera,
                                render_stride=stride)
      ret = render_image_mono(self.model, self.params, rb,
                              state["featmaps"], self.cfg,
                              self.config.chunk_size,
                              (h + stride - 1) // stride,
                              (w + stride - 1) // stride,
                              mesh=self.mesh)
      ref = ret["outputs_coarse_ref"]
      out = {
          "rgb": np.asarray(ref["rgb"], np.float32),
          "depth": np.asarray(ref["depth"], np.float32),
      }
      if layers:
        # dynamic/static decompositions come out of the dual composite for
        # free (core/composite.py); the st-only model render as well
        out["rgb_dy"] = np.asarray(ref["rgb_dy"], np.float32)
        out["rgb_st"] = np.asarray(ret["outputs_coarse_st"]["rgb"],
                                   np.float32)
      self.stats["renders"] += 1
      self.timings["render_s"] += time.perf_counter() - t0
    return out

  def render_path(self, c2ws, frame_idxs, stride: int = 1,
                  layer: str = "rgb") -> "list[np.ndarray]":
    """Render a camera path: aligned pose/frame lists -> list of images.

    Feature maps are LRU-cached per frame, so stabilization paths (one new
    frame per pose) pay one encode per frame and wander paths (one frame,
    many poses) pay one total.
    """
    if len(c2ws) != len(frame_idxs):
      raise ValueError(f"{len(c2ws)} poses vs {len(frame_idxs)} frame_idxs")
    frames = []
    for c2w, idx in zip(c2ws, frame_idxs):
      out = self.render(np.asarray(c2w, np.float32), int(idx),
                        stride=stride, layers=layer in ("rgb_dy", "rgb_st"))
      if layer not in out:
        raise ValueError(f"unknown layer {layer!r}")
      frames.append(out[layer])
    if layer == "depth":
      # one normalization range for the whole path — per-frame min/max
      # would make the depth video flicker as scene depth shifts
      lo = min(float(f.min()) for f in frames)
      hi = max(float(f.max()) for f in frames)
      frames = [(f - lo) / max(hi - lo, 1e-8) for f in frames]
    return frames

  # ------------------------------------------------------------------- meta
  def meta(self) -> Dict[str, Any]:
    return {
        "scene": self.config.train_scenes[0],
        "num_frames": int(self.data.num_frames),
        "height": self.height,
        "width": self.width,
        "depth_range": [float(x) for x in np.asarray(self.data.depth_range)],
        "checkpoint_step": int(self.step),
        "frame_window": [3, int(self.data.num_frames - 4)],
    }

  def warmup(self, frame_idx: int = 3, stride: int = 8) -> float:
    """Compile the chunk renderer + featmaps; returns elapsed seconds."""
    t0 = time.perf_counter()
    self.render(np.asarray(self.data.c2w[frame_idx]), frame_idx,
                stride=stride)
    return time.perf_counter() - t0
