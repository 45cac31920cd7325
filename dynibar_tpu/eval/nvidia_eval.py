"""Nvidia Dynamic Scenes benchmark evaluation harness.

Rebuild of the reference eval loop (eval_nvidia.py:266-481): frames
3..N-3 × 11 of 12 round-robin viewpoints, masked PSNR/SSIM/LPIPS over the
full image, the dynamic region (mv_masks) and the static complement, with
running and final averages.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.data.nvidia import NUM_VIEWPOINTS, NvidiaSceneData
from dynibar_tpu.eval.lpips import LPIPSMetric
from dynibar_tpu.eval.metrics import masked_psnr, masked_ssim
from dynibar_tpu.models.dynibar import FFModel
from dynibar_tpu.render.render_image import full_image_ray_batch, render_image_ff


def _imread_resized(path: str, wh) -> np.ndarray:
  import cv2
  img = cv2.imread(path)[:, :, ::-1]
  img = cv2.resize(img, dsize=wh, interpolation=cv2.INTER_AREA)
  return np.float32(img) / 255.0


def _mask_resized(path: str, wh) -> np.ndarray:
  import cv2
  m = np.float32(cv2.imread(path) > 1e-3)
  return cv2.resize(m, dsize=wh, interpolation=cv2.INTER_NEAREST)


@dataclasses.dataclass
class MetricAccumulator:
  psnr: List[float] = dataclasses.field(default_factory=list)
  ssim: List[float] = dataclasses.field(default_factory=list)
  lpips: List[float] = dataclasses.field(default_factory=list)

  def add(self, psnr, ssim, lpips):
    self.psnr.append(psnr)
    self.ssim.append(ssim)
    if lpips is not None:
      self.lpips.append(lpips)

  def means(self) -> Dict[str, float]:
    out = {"psnr": float(np.mean(self.psnr)) if self.psnr else float("nan"),
           "ssim": float(np.mean(self.ssim)) if self.ssim else float("nan")}
    out["lpips"] = float(np.mean(self.lpips)) if self.lpips else float("nan")
    return out


def evaluate_scene(
    config: DynibarConfig,
    model: FFModel,
    params,
    scene: str,
    lpips_weights_dir: Optional[str] = None,
    frame_range: Optional[range] = None,
    log_fn: Callable[[str], None] = print,
    mesh=None,
) -> Dict[str, Dict[str, float]]:
  """Run the full benchmark protocol on one scene; returns metric tables."""
  import jax.numpy as jnp

  data = NvidiaSceneData(config, scene, height=config.training_height)
  cfg = model.cfg
  lpips = LPIPSMetric(lpips_weights_dir)
  full = MetricAccumulator()
  dyn = MetricAccumulator()
  stat = MetricAccumulator()

  frames = frame_range or range(3, data.num_frames - 3)
  for img_i in frames:
    template = data.eval_batch(img_i, 0)
    # feature maps are per-frame; encode once, reuse for all 11 viewpoints
    src = jnp.asarray(template["src_rgbs"])
    st_src = jnp.asarray(template["static_src_rgbs"])
    if config.mask_static:
      st_masked = st_src * jnp.asarray(
          template["static_src_masks"])[..., None]
    else:
      st_masked = st_src
    # coarse: dy <- coarse channels, static <- fine channels
    # (reference eval_nvidia.py:335-358)
    coarse = (model.apply_feature(params, "feature_net", src)[0], None,
              model.apply_feature(params, "feature_net", st_src)[1])
    fine = (model.apply_feature(params, "feature_net_fine", src)[0], None,
            model.apply_feature(params, "feature_net_fine", st_masked)[1])

    for cam_i in range(NUM_VIEWPOINTS):
      if img_i % NUM_VIEWPOINTS == cam_i:
        continue  # skip the time-aligned viewpoint (eval_nvidia.py:317)
      t0 = time.time()
      batch = data.eval_batch(img_i, cam_i)
      rb = {k: jnp.asarray(v) for k, v in batch.items()
            if k != "static_src_masks"}
      rb = full_image_ray_batch(rb, rb["camera"])
      h = int(batch["camera"][0])
      w = int(batch["camera"][1])
      ret = render_image_ff(model, params, rb, coarse, fine, cfg,
                            config.chunk_size, h, w, mesh=mesh)
      pred = np.asarray(ret["outputs_fine_ref"]["rgb"])

      valid = np.float32(pred.sum(-1, keepdims=True) > 1e-3)
      valid = np.tile(valid, (1, 1, 3))
      # The reference zeroes GT where the prediction is dark
      # (eval_nvidia.py:388-390) — replicated for parity, but a mostly-dark
      # prediction (e.g. an unconverged/random-init model) would silently
      # inflate PSNR; make that failure mode loud.
      invalid_frac = 1.0 - float(valid.mean())
      if invalid_frac > 0.05:
        log_fn(f"WARNING: frame {img_i} cam {cam_i}: valid-mask drops "
               f"{invalid_frac:.1%} of pixels (dark prediction); "
               "full/static/dynamic metrics are inflated for this frame")
      gt = _imread_resized(data.gt_image_path(img_i, cam_i), (w, h)) * valid
      pred = pred * valid

      full.add(masked_psnr(gt, pred, valid), masked_ssim(gt, pred, valid),
               lpips(gt, pred, valid) if lpips.available else None)

      dmask = _mask_resized(data.mask_path(img_i, cam_i), (w, h))
      dyn.add(masked_psnr(gt, pred, dmask), masked_ssim(gt, pred, dmask),
              lpips(gt, pred, dmask) if lpips.available else None)
      smask = 1.0 - dmask
      stat.add(masked_psnr(gt, pred, smask), masked_ssim(gt, pred, smask),
               lpips(gt, pred, smask) if lpips.available else None)
      log_fn(f"frame {img_i} cam {cam_i}: "
             f"psnr={full.psnr[-1]:.2f} ssim={full.ssim[-1]:.4f} "
             f"({time.time() - t0:.1f}s)")

    log_fn(f"MOVING full={full.means()} dynamic={dyn.means()} "
           f"static={stat.means()}")

  result = {"full": full.means(), "dynamic": dyn.means(),
            "static": stat.means()}
  log_fn(f"FINAL {result}")
  return result
