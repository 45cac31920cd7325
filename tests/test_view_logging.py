"""Training observability: one logged step writes every reference panel
equivalent (train.py:576-762) — cross-time render, occlusion map, exp_sf
magnitude and flow wheels included (VERDICT round-1 item 6)."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.train.view_logging import log_train_view
from dynibar_tpu.utils.logging import MetricsLogger

CFG = RenderSettings(n_samples=8, num_views_dy=9, num_views_anchor=10,
                     num_views_static=6, num_vv=3, num_basis=4)
H, W = 12, 16

EXPECTED_PANELS = [
    "render_rgb_coarse_ref", "render_rgb_coarse_anchor",
    "render_rgb_static", "render_rgb_dynamic", "st_rgb_pred",
    "render_depth_coarse", "occ_weight_map", "exp_sf_mag",
    "gt_rgb_coarse", "gt_disp_coarse",
    "rd_flow_0", "rd_flow_5", "gt_flow_0", "gt_flow_5",
]


def test_log_train_view_writes_all_panels(tmp_path):
  model = MonoModel(cfg=CFG, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = synthetic_mono_batch(CFG, n_rays=8, h=H, w=W, num_frames=32)
  logger = MetricsLogger(str(tmp_path), use_tensorboard=False)

  gt = np.zeros((H, W, 3), np.float32)
  gt_disp = np.ones((H, W), np.float32)
  gt_flows = np.zeros((6, H, W, 2), np.float32)
  ret = log_train_view(logger, 100, model, params, rb, CFG,
                       chunk_size=64, gt_image=gt, gt_disp=gt_disp,
                       gt_flows=gt_flows)

  written = {os.path.basename(p) for p in
             glob.glob(str(tmp_path / "images" / "*.png"))}
  for panel in EXPECTED_PANELS:
    assert f"00000100_train_{panel}.png" in written, panel

  # the train-view render carried the anchor branch at full frame
  anchor = ret["outputs_coarse_anchor"]
  assert anchor["occ_weight_map"].shape == (H, W)
  assert np.isfinite(np.asarray(anchor["occ_weight_map"])).all()
  assert ret["outputs_coarse_ref"]["render_flows"].shape == (H, W, 6, 2)
