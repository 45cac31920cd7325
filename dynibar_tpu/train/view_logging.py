"""Full-frame TensorBoard panels during training.

Rebuild of the reference's ``log_view_to_tb`` (train.py:576-762): every
``i_img`` steps render the current training view at full resolution *in
train mode* (cross-time anchor branch included) and log predicted rgb
(composite / static / dynamic / cross-time), depths, the occlusion-weight
map, expected-scene-flow magnitude, GT rgb/disparity, and rendered-vs-GT
optical-flow wheels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

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
                   gt_disp: np.ndarray,
                   gt_flows: Optional[np.ndarray] = None,
                   prefix: str = "train/"):
  """Render the full current training view and write image panels.

  rb is the (host or device) training ray batch; gt_image [H, W, 3];
  gt_disp [H, W]; gt_flows optional [V<=6, H, W, 2] full-frame flow GT for
  the flow-wheel panels.
  """
  h, w = gt_image.shape[:2]
  rb_dev = {k: jnp.asarray(v) for k, v in rb.items()}
  full_rb = full_image_ray_batch(rb_dev, rb_dev["camera"])
  featmaps = compute_featmaps(model, params, full_rb)
  ret = render_image_mono(model, params, full_rb, featmaps, cfg,
                          chunk_size=chunk_size, height=h, width=w,
                          train_view=True)

  out = ret["outputs_coarse_ref"]
  anchor = ret["outputs_coarse_anchor"]
  logger.image(step, prefix + "render_rgb_coarse_ref",
               np.clip(out["rgb"], 0, 1))
  logger.image(step, prefix + "render_rgb_coarse_anchor",
               np.clip(anchor["rgb"], 0, 1))
  if "rgb_static" in out:
    logger.image(step, prefix + "render_rgb_static",
                 np.clip(out["rgb_static"], 0, 1))
    logger.image(step, prefix + "render_rgb_dynamic",
                 np.clip(out["rgb_dy"], 0, 1))
  logger.image(step, prefix + "st_rgb_pred",
               np.clip(ret["outputs_coarse_st"]["rgb"], 0, 1))

  def _2d(x):
    return x[..., 0] if x.ndim == 3 else x

  logger.image(step, prefix + "render_depth_coarse",
               colorize_np(_2d(out["depth"]), cmap_name="jet"))
  logger.image(step, prefix + "occ_weight_map",
               colorize_np(_2d(anchor["occ_weight_map"]), cmap_name="gray"))
  logger.image(step, prefix + "exp_sf_mag",
               colorize_np(np.linalg.norm(out["exp_sf"], axis=-1),
                           cmap_name="gray"))
  logger.image(step, prefix + "gt_rgb_coarse", gt_image)
  logger.image(step, prefix + "gt_disp_coarse",
               colorize_np(gt_disp, cmap_name="jet"))

  # rendered-vs-GT flow wheels (reference train.py:729-759); render_flows
  # comes back [H, W, V, 2] from the train-view render
  flows = np.moveaxis(np.asarray(out["render_flows"]), 2, 0)  # [V, H, W, 2]
  for ii in range(min(6, flows.shape[0])):
    logger.image(step, prefix + f"rd_flow_{ii}",
                 flow_to_image(flows[ii]) / 255.0)
  if gt_flows is not None:
    for ii in range(min(6, gt_flows.shape[0])):
      logger.image(step, prefix + f"gt_flow_{ii}",
                   flow_to_image(np.asarray(gt_flows[ii])) / 255.0)
  return ret
