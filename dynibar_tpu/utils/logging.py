"""Metrics / image logging.

TensorBoard when available (torch.utils.tensorboard is in the image),
JSONL fallback otherwise — rebuilds the reference's SummaryWriter usage
(train.py:106-108, 458-472, 576-762) without a hard torch dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
  """enabled=False makes every method a no-op (and touches no files) — the
  rank-0-only IO switch for multi-host training (reference train.py:106)."""

  def __init__(self, log_dir: str, use_tensorboard: bool = True,
               enabled: bool = True):
    self.enabled = enabled
    self._log_dir = log_dir
    self._tb = None
    self._jsonl = None
    if not enabled:
      return
    os.makedirs(log_dir, exist_ok=True)
    if use_tensorboard:
      try:
        from torch.utils.tensorboard import SummaryWriter
        self._tb = SummaryWriter(log_dir)
      except Exception:
        self._tb = None
    self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

  def scalars(self, step: int, values: Dict[str, float], prefix: str = ""):
    if not self.enabled:
      return
    rec = {"step": step, "time": time.time()}
    for k, v in values.items():
      rec[prefix + k] = float(v)
      if self._tb is not None:
        self._tb.add_scalar(prefix + k, float(v), step)
    self._jsonl.write(json.dumps(rec) + "\n")
    self._jsonl.flush()

  def image(self, step: int, tag: str, img_hwc: np.ndarray):
    """img_hwc float [H, W, 3] in [0, 1].

    TensorBoard when available; PNG files under <log_dir>/images/
    otherwise, so the training panels are never silently dropped."""
    if not self.enabled:
      return
    if self._tb is not None:
      self._tb.add_image(tag, np.clip(img_hwc, 0, 1),
                         step, dataformats="HWC")
      return
    import imageio.v2 as imageio
    img_dir = os.path.join(self._log_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    safe_tag = tag.replace("/", "_")
    img8 = (np.clip(img_hwc, 0, 1) * 255).astype(np.uint8)
    imageio.imwrite(os.path.join(img_dir, f"{step:08d}_{safe_tag}.png"),
                    img8)

  def close(self):
    if self._tb is not None:
      self._tb.close()
    if self._jsonl is not None:
      self._jsonl.close()
