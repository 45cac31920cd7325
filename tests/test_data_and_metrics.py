"""Host-side data / metric / config tests (no heavy compiles)."""

import os
import tempfile

import numpy as np
import pytest

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.data import llff
from dynibar_tpu.data.view_selection import (get_interval_pose_ids,
                                             get_nearest_pose_ids,
                                             mono_static_pose_ids)
from dynibar_tpu.data.nvidia import nvidia_static_pose_ids
from dynibar_tpu.eval.metrics import masked_psnr, masked_ssim


def test_config_from_reference_style_file():
  txt = """
expname = kid-running
folder_path = /data/videos
N_rand = 3072
N_samples = 64
N_importance = 0
num_source_views = 7
inv_uniform = True
init_decay_epoch = 150
lrate_feature = 8e-4
lrate_mlp = 4e-4
train_scenes = kid-running
"""
  with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
    fh.write(txt)
    path = fh.name
  cfg = DynibarConfig.from_file(path)
  os.unlink(path)
  assert cfg.expname == "kid-running"
  assert cfg.N_rand == 3072
  assert cfg.inv_uniform is True
  assert cfg.lrate_feature == pytest.approx(8e-4)
  assert cfg.train_scenes == ["kid-running"]
  name = cfg.experiment_name()
  assert name.startswith("kid-running_mr-35_w-disp-0.050")


def test_llff_pose_parse_roundtrip_conventions():
  pose = np.zeros((3, 5))
  pose[:3, :3] = np.eye(3)
  pose[:, 3] = [1.0, 2.0, 3.0]
  pose[:, 4] = [288, 512, 400.0]
  intr, c2w = llff.parse_llff_pose(pose)
  assert intr[0, 0] == 400.0 and intr[0, 2] == 256.0 and intr[1, 2] == 144.0
  # columns 1:3 negated
  np.testing.assert_allclose(c2w[:3, 1], [0, -1, 0])
  np.testing.assert_allclose(c2w[:3, 2], [0, 0, -1])
  np.testing.assert_allclose(c2w[:3, 3], [1, 2, 3])


def test_recenter_poses_centers_average():
  rng = np.random.RandomState(0)
  poses = np.zeros((10, 3, 5), np.float32)
  for i in range(10):
    poses[i, :3, :3] = np.eye(3)
    poses[i, :, 3] = rng.randn(3)
    poses[i, :, 4] = [288, 512, 400]
  rec = llff.recenter_poses(poses.copy())
  center = rec[:, :3, 3].mean(0)
  np.testing.assert_allclose(center, 0.0, atol=1e-5)


def test_render_paths_shapes():
  poses = np.zeros((12, 3, 5), np.float32)
  for i in range(12):
    poses[i, :3, :3] = np.eye(3)
    poses[i, 0, 3] = i * 0.1
    poses[i, :, 4] = [64, 96, 80]
  stab = llff.render_stabilization_path(poses, k_size=5)
  assert len(stab) == 12 and stab[0].shape == (3, 5)
  # rotation columns stay orthonormal
  r = np.stack([p[:3, :3] for p in stab])
  eye = np.einsum("nij,nik->njk", r, r)
  np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                             atol=1e-5)
  wander = llff.render_wander_path(poses[5], num_frames=10)
  assert len(wander) == 10


def test_view_selection_orders_and_excludes_target():
  rng = np.random.RandomState(0)
  poses = np.stack([np.eye(4) for _ in range(20)])
  poses[:, 0, 3] = np.arange(20) * 1.0
  ids = get_nearest_pose_ids(poses[5], poses, tar_id=5,
                             angular_dist_method="dist")
  assert ids[0] in (4, 6) and 5 not in ids[:10]
  ids2 = get_interval_pose_ids(poses[5], poses, tar_id=-1, interval=4)
  assert set(ids2) == set(range(0, 20, 4))
  st = mono_static_pose_ids(10, 20, 7, 35, poses[10], poses, rng)
  assert 10 not in st
  assert (st >= 0).all() and (st < 20).all()
  # short-scene edge: max_range // views <= 1 crashes the reference
  # (randint(2, 2)); ours floors the interval at 2 (view_selection.py)
  st_small = mono_static_pose_ids(10, 20, 7, 12, poses[10], poses, rng)
  assert 10 not in st_small
  assert (st_small >= 0).all() and (st_small < 20).all()


def test_nvidia_static_ids_skip_render_viewpoint():
  ids = nvidia_static_pose_ids(render_idx=14, num_frames=48)
  assert len(ids) == 11
  assert all(i % 12 != 14 % 12 for i in ids)
  # each picked id is the closest of its viewpoint group to frame 14
  for i in ids:
    group = [g for g in range(48) if g % 12 == i % 12]
    assert abs(i - 14) == min(abs(g - 14) for g in group)


def test_masked_psnr_ssim_basics():
  rng = np.random.RandomState(0)
  img = rng.rand(32, 48, 3)
  mask = np.ones((32, 48, 3))
  assert masked_psnr(img, img, mask) == 0.0  # reference returns 0 on mse==0
  noisy = np.clip(img + 0.1 * rng.randn(32, 48, 3), 0, 1)
  p = masked_psnr(img, noisy, mask)
  assert 15 < p < 30
  s_same = masked_ssim(img, img, mask)
  assert s_same == pytest.approx(1.0, abs=1e-6)
  s_noisy = masked_ssim(img, noisy, mask)
  assert s_noisy < s_same
  # mask actually restricts the region
  half = np.zeros_like(mask)
  half[:16] = 1
  img2 = img.copy()
  img2[16:] = 0  # corrupt only the unmasked half
  assert masked_psnr(img, img2, half) == pytest.approx(0.0)  # mse==0 -> 0


def test_synthetic_batch_contract():
  from dynibar_tpu.config import RenderSettings
  from dynibar_tpu.data.ray_batch import synthetic_mono_batch
  cfg = RenderSettings(n_samples=16, num_views_dy=9, num_views_anchor=10,
                       num_views_static=6, num_vv=3, num_basis=4)
  rb = synthetic_mono_batch(cfg, n_rays=32, h=48, w=64, num_frames=32)
  assert rb["src_rgbs"].shape == (9, 48, 64, 3)
  assert rb["anchor_src_rgbs"].shape == (10, 48, 64, 3)
  assert rb["static_src_rgbs"].shape == (6, 48, 64, 3)
  assert rb["flows"].shape == (6, 32, 2)
  assert rb["src_offset_idx"].tolist()[:6] == [4, 5, 6, 2, 1, 0]
  assert (rb["src_offset_idx"][6:] == 3).all()  # virtual views
  # anchor offsets of real views exclude the slot pointing at ref frame
  valid_real = (rb["anchor_valid"] > 0) & (rb["anchor_is_vv"] < 1)
  offs = rb["anchor_offset_idx"][valid_real] - 3
  delta = int(rb["anchor_frame_idx"]) - int(rb["ref_frame_idx"])
  assert all(o != -delta for o in offs)


def test_prefetch_pipeline_yields_and_closes():
  from dynibar_tpu.data.pipeline import PrefetchPipeline

  def sample(rng):
    return {"x": rng.rand(4).astype(np.float32)}

  with PrefetchPipeline(sample, num_workers=2, prefetch_depth=2,
                        device_put=False) as pipe:
    a = next(pipe)
    b = next(pipe)
    assert a["x"].shape == (4,)
    assert not np.allclose(a["x"], b["x"])
