"""End-to-end dataset test: build a tiny scene on disk in the reference's
layout, load it through MonocularSceneData, and render/train one step.

This exercises the real file path: poses_bounds_cvd.npy parsing + recenter,
images_WxH, disp/, flow_i{1,2,3}/, dynamic/static masks,
source_virtual_views + source_vv_poses.npy, curriculum anchor selection and
static view selection — everything the jitted step consumes.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynibar_tpu.config import DynibarConfig, RenderSettings
from dynibar_tpu.data.monocular import MonocularSceneData

NUM_FRAMES = 12
H, W = 32, 48
FOCAL = 40.0


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
  return build_tiny_scene(tmp_path_factory.mktemp("scenes"))


def build_tiny_scene(root):
  """Write a minimal reference-layout scene under root/tiny/dense."""
  import imageio.v2 as imageio
  dense = root / "tiny" / "dense"
  rng = np.random.RandomState(0)

  (dense / "images").mkdir(parents=True)
  (dense / f"images_{W}x{H}").mkdir()
  (dense / "disp").mkdir()
  for i in (1, 2, 3):
    (dense / f"flow_i{i}").mkdir()
  (dense / "dynamic_masks").mkdir()
  (dense / "static_masks").mkdir()
  vv_dir = dense / f"source_virtual_views_{W}x{H}"
  vv_dir.mkdir()

  rows = []
  vv_poses = []
  for i in range(NUM_FRAMES):
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    imageio.imwrite(dense / "images" / f"{i:05d}.png", img)
    imageio.imwrite(dense / f"images_{W}x{H}" / f"{i:05d}.png", img)
    np.save(dense / "disp" / f"{i:05d}.npy",
            rng.rand(H, W).astype(np.float32) * 0.3 + 0.1)
    mask = (rng.rand(H, W) > 0.7).astype(np.uint8) * 255
    imageio.imwrite(dense / "dynamic_masks" / f"{i}.png", mask)
    imageio.imwrite(dense / "static_masks" / f"{i}.png", 255 - mask)
    for interval in (1, 2, 3):
      for tag in ("fwd", "bwd"):
        np.savez(dense / f"flow_i{interval}" / f"{i:05d}_{tag}.npz",
                 flow=rng.randn(H, W, 2).astype(np.float32),
                 mask=np.ones((H, W), np.float32))
    # LLFF pose row: camera moving in x, identity-ish rotation
    pose = np.zeros((3, 5))
    pose[:3, :3] = np.eye(3)
    pose[0, 3] = 0.1 * i
    pose[:, 4] = [H, W, FOCAL]
    rows.append(np.concatenate([pose.reshape(-1), [2.0, 12.0]]))
    # 8 virtual views per frame (3x4, raw LLFF convention, no hwf)
    frame_vv = []
    frame_dir = vv_dir / f"{i:05d}"
    frame_dir.mkdir()
    for k in range(8):
      imageio.imwrite(frame_dir / f"{k:02d}.png", img)
      vpose = pose[:, :4].copy()
      vpose[1, 3] += 0.02 * k
      frame_vv.append(vpose)
    vv_poses.append(np.stack(frame_vv))
  np.save(dense / "poses_bounds_cvd.npy", np.stack(rows))
  # reference layout: [num_vv, 3, 4, num_frames]
  np.save(dense / "source_vv_poses.npy",
          np.moveaxis(np.stack(vv_poses), 0, -1).astype(np.float32))
  return str(root)


def test_scene_loads_and_samples(scene_dir):
  config = DynibarConfig(folder_path=scene_dir, training_height=H,
                         num_source_views=4, max_range=8, num_vv=2,
                         init_decay_epoch=2)
  data = MonocularSceneData(config, "tiny")
  assert data.num_frames == NUM_FRAMES
  data.set_epoch(0)
  rb = data.sample_batch(np.random.RandomState(0), n_rays=16)

  cfg = data.cfg
  assert rb["src_rgbs"].shape == (cfg.num_views_dy, H, W, 3)
  assert rb["anchor_src_rgbs"].shape[0] == cfg.num_views_anchor
  assert rb["static_src_rgbs"].shape[0] == cfg.num_views_static
  assert rb["flows"].shape == (6, 16, 2)
  assert rb["rgb"].shape == (16, 3)
  assert 3 <= int(rb["ref_frame_idx"]) < NUM_FRAMES - 3
  delta = int(rb["anchor_frame_idx"]) - int(rb["ref_frame_idx"])
  assert 1 <= abs(delta) <= 1  # epoch 0 -> max_step 1
  # curriculum widens the anchor pool
  data.set_epoch(5)
  deltas = set()
  for seed in range(20):
    rb2 = data.sample_batch(np.random.RandomState(seed), n_rays=4)
    deltas.add(int(rb2["anchor_frame_idx"]) - int(rb2["ref_frame_idx"]))
  assert max(abs(d) for d in deltas) >= 2

  # depth range carries the 0.9 / 1.5 margins and scene minimum rules
  near, far = float(rb["depth_range"][0]), float(rb["depth_range"][1])
  assert near < far and near > 0

  # center sampling mode restricts the pixel region
  rbc = data.sample_batch(np.random.RandomState(1), n_rays=16,
                          sample_mode="center")
  uv = rbc["uv_grid"]
  assert uv[:, 0].min() >= int(W * 0.1) - 1
  assert uv[:, 1].min() >= int(H * 0.1) - 1


def test_scene_batch_trains_one_step(scene_dir):
  config = DynibarConfig(folder_path=scene_dir, training_height=H,
                         num_source_views=4, max_range=8, num_vv=2,
                         init_decay_epoch=2, N_samples=8, num_basis=4)
  data = MonocularSceneData(config, "tiny")
  data.set_epoch(0)
  rb = data.sample_batch(np.random.RandomState(0), n_rays=8)

  from dynibar_tpu.models.dynibar import MonoModel
  from dynibar_tpu.train.losses import schedule_weights
  from dynibar_tpu.train.trainer import create_train_state, make_train_step
  cfg = data.cfg
  model = MonoModel(cfg=cfg, num_frames=data.num_frames)
  state, tx = create_train_state(model, config, jax.random.PRNGKey(0))
  step = make_train_step(model, tx, cfg, donate=False)
  rb_dev = {k: jnp.asarray(v) for k, v in rb.items()}
  state2, metrics = step(state, rb_dev, schedule_weights(config, 0),
                         jax.random.PRNGKey(1))
  assert np.isfinite(float(metrics["loss"]))


def test_center_mode_sampling(scene_dir):
  config = DynibarConfig(folder_path=scene_dir, training_height=H,
                         num_source_views=4, max_range=8, num_vv=2,
                         init_decay_epoch=2)
  data = MonocularSceneData(config, "tiny")
  data.set_epoch(0)
  rbc = data.sample_batch(np.random.RandomState(0), n_rays=16,
                          sample_mode="center")
  assert rbc["uv_grid"].shape == (16, 2)
