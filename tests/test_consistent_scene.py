"""ConsistentScene generator: internal geometric consistency + roundtrip
through the real dataset loader (the testbed for convergence runs)."""

import numpy as np
import pytest

from dynibar_tpu.data.synthetic_scene import ConsistentScene


@pytest.fixture(scope="module")
def scene():
  return ConsistentScene(num_frames=12, height=48, width=72)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory, scene):
  root = tmp_path_factory.mktemp("consistent")
  name = scene.write(str(root), "toy")
  return str(root), name


def test_rays_match_core_cameras(scene):
  import jax.numpy as jnp
  from dynibar_tpu.core.cameras import intrinsics_from_hwf, pixel_rays
  c2w = scene.c2w(3)
  k = intrinsics_from_hwf(scene.h, scene.w, scene.f)
  ro, rd, uv = pixel_rays(scene.h, scene.w, jnp.asarray(k),
                          jnp.asarray(c2w, jnp.float32))
  o, d, uv_np = scene._rays(c2w)
  np.testing.assert_allclose(np.asarray(rd).reshape(scene.h, scene.w, 3),
                             d, atol=1e-5)
  np.testing.assert_allclose(np.asarray(ro)[0], o, atol=1e-7)
  np.testing.assert_allclose(np.asarray(uv).reshape(scene.h, scene.w, 2),
                             uv_np, atol=0)


def test_flow_exact_against_analytic_target(scene):
  """Ray through uv+flow in the target camera first-hits the SAME surface
  point (exact multi-view consistency of the flow field)."""
  i, off = 5, 2
  flow, mask = scene.flow(i, off)
  o_i, d_i, uv = scene._rays(scene.c2w(i))
  p, label = scene._surface(o_i, d_i, float(i))
  shift = scene.disc_center(i + off) - scene.disc_center(i)
  p2 = p + np.where((label == 2)[..., None],
                    np.array([shift[0], shift[1], 0.0]), 0.0)

  c2w_j = scene.c2w(i + off)
  uv2 = uv + flow
  d_j = np.stack([(uv2[..., 0] - scene.w / 2.0) / scene.f,
                  (uv2[..., 1] - scene.h / 2.0) / scene.f,
                  np.ones_like(uv2[..., 0])], axis=-1) @ c2w_j[:3, :3].T
  p_j, label_j = scene._surface(c2w_j[:3, 3], d_j, float(i + off))
  ok = mask > 0
  assert ok.mean() > 0.8
  np.testing.assert_allclose(p_j[ok], p2[ok], atol=1e-6)
  assert (label_j[ok] == label[ok]).all()


def test_flow_warp_on_saved_images(scene, scene_dir):
  """Non-circular check: bilinearly warping the SAVED target png by the
  saved flow reproduces the saved source png away from surface edges."""
  import imageio.v2 as imageio
  import os
  root, name = scene_dir
  dense = os.path.join(root, name, "dense")
  i, off = 4, 1
  src = imageio.imread(
      os.path.join(dense, "images", f"{i:05d}.png")).astype(np.float32) / 255
  tgt = imageio.imread(
      os.path.join(dense, "images",
                   f"{i + off:05d}.png")).astype(np.float32) / 255
  data = np.load(os.path.join(dense, "flow_i1", f"{i:05d}_fwd.npz"))
  flow, mask = data["flow"], data["mask"]

  o_i, d_i, uv = scene._rays(scene.c2w(i))
  _, label_src = scene._surface(o_i, d_i, float(i))
  o_j, d_j, _ = scene._rays(scene.c2w(i + off))
  _, label_tgt = scene._surface(o_j, d_j, float(i + off))

  uv2 = uv + flow
  x0 = np.floor(uv2[..., 0]).astype(int)
  y0 = np.floor(uv2[..., 1]).astype(int)
  ok = (mask > 0) & (x0 >= 0) & (y0 >= 0) & (x0 + 1 < scene.w) \
      & (y0 + 1 < scene.h)
  # all 4 bilinear taps on the same surface as the source pixel
  same = np.ones_like(ok)
  for dy in (0, 1):
    for dx in (0, 1):
      same &= (label_tgt[np.clip(y0 + dy, 0, scene.h - 1),
                         np.clip(x0 + dx, 0, scene.w - 1)] == label_src)
  ok &= same
  assert ok.mean() > 0.6

  fx = uv2[..., 0] - x0
  fy = uv2[..., 1] - y0
  warped = ((1 - fx)[..., None] * (1 - fy)[..., None] * tgt[y0, x0]
            + fx[..., None] * (1 - fy)[..., None] * tgt[y0, x0 + 1]
            + (1 - fx)[..., None] * fy[..., None] * tgt[y0 + 1, x0]
            + fx[..., None] * fy[..., None] * tgt[y0 + 1, x0 + 1])
  err = np.abs(warped - src)[ok]
  assert err.mean() < 0.02, err.mean()


def test_loader_roundtrip_rigid_and_disp(scene, scene_dir):
  """MonocularSceneData reproduces the designed cameras up to ONE global
  rigid transform + uniform scale; disparity supervision matches the scaled
  world; motion_mask is 1 exactly on (an erosion of) the disc."""
  root, name = scene_dir
  from dynibar_tpu.config import DynibarConfig
  from dynibar_tpu.data.monocular import MonocularSceneData
  config = DynibarConfig(folder_path=root, train_scenes=[name],
                         training_height=scene.h, num_source_views=4,
                         max_range=8, num_vv=2, N_rand=64,
                         init_decay_epoch=2)
  data = MonocularSceneData(config, name)
  assert data.num_frames == scene.num_frames
  s = data.scale

  ms = []
  for i in range(scene.num_frames):
    c_s = scene.c2w(i).copy()
    c_s[:3, 3] *= s
    ms.append(data.c2w[i].astype(np.float64) @ np.linalg.inv(c_s))
  m0 = ms[0]
  for m in ms[1:]:
    np.testing.assert_allclose(m, m0, atol=1e-4)
  r = m0[:3, :3]
  np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
  assert abs(np.linalg.det(r) - 1.0) < 1e-5

  _, depth, dyn = scene.render(scene.c2w(5), 5.0)
  np.testing.assert_allclose(data._load_disp(5), (1.0 / depth) / s,
                             rtol=1e-5)

  mm = data._load_mask(5, "dynamic", (scene.h, scene.w))
  assert mm.sum() > 0
  assert (mm.astype(bool) <= dyn).all() or (mm.astype(bool) & ~dyn).mean() < 0.01

  rb = data.sample_batch(np.random.RandomState(0), 64)
  assert rb["rgb"].shape == (64, 3)
  assert np.isfinite(rb["disp"]).all()
