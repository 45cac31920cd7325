"""Optical-flow IO + warping utilities.

Rebuilds the non-visualization parts of reference
ibrnet/data_loaders/flow_utils.py (``warp_flow``, :6-22) and the flow .npz
reading convention (monocular.py:91-112).  The color wheel lives in
dynibar_tpu/utils/viz.py.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def read_optical_flow(scene_path: str, frame_idx: int, fwd: bool,
                      interval: int) -> Tuple[np.ndarray, np.ndarray]:
  """Load flow_i<interval>/<frame>_{fwd,bwd}.npz -> (flow [H,W,2], mask)."""
  tag = "fwd" if fwd else "bwd"
  path = os.path.join(scene_path, f"flow_i{interval}",
                      f"{frame_idx:05d}_{tag}.npz")
  data = np.load(path)
  return data["flow"], np.float32(data["mask"])


def warp_flow(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
  """Backward-warp `img` by `flow` (bilinear), numpy/cv2.

  out(x) = img(x + flow(x)) — parity with reference flow_utils.py:6-22.
  """
  import cv2
  h, w = flow.shape[:2]
  remap = flow.copy()
  remap[:, :, 0] += np.arange(w)
  remap[:, :, 1] += np.arange(h)[:, None]
  return cv2.remap(img, remap.astype(np.float32), None, cv2.INTER_LINEAR)
