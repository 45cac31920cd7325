"""Preprocessing golden: cli.save_monocular_cameras vs the ACTUAL
reference script.

/root/reference/save_monocular_cameras.py only needs cv2/imageio/numpy —
all present — so the real script runs here as a subprocess on a synthetic
dynamic-video-depth output (the optimizer's npz layout: img_1 [1,3,H,W],
depth [1,1,H,W], K stored TRANSPOSED at [1,1,1,3,3], cam_c2w [1,4,4]) and
its outputs (poses_bounds_cvd.npy, disp/*.npy, images_WxH/*.png) are the
ground truth our CLI must reproduce on the same inputs.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF_SCRIPT = "/root/reference/save_monocular_cameras.py"

pytestmark = pytest.mark.skipif(not os.path.isfile(REF_SCRIPT),
                                reason="reference tree not available")

N_FRAMES = 6
H0, W0 = 72, 96            # optimizer resolution; FINAL_H=288 -> 384x288


def _write_inputs(root, rng):
  import imageio.v2 as imageio
  img_dir = root / "dense" / "images"
  cvd_dir = root / "cvd"
  img_dir.mkdir(parents=True)
  cvd_dir.mkdir()
  k_true = np.array([[110.0, 0.0, W0 / 2.0],
                     [0.0, 110.4, H0 / 2.0],
                     [0.0, 0.0, 1.0]])
  for i in range(N_FRAMES):
    img = (rng.rand(H0, W0, 3) * 255).astype(np.uint8)
    imageio.imwrite(img_dir / f"{i:05d}.png", img)
    depth = (rng.rand(H0, W0) * 9.0 + 1.0).astype(np.float32)
    c2w = np.eye(4)
    c2w[:3, 3] = [0.1 * i, -0.05 * i, 0.02 * i]
    th = 0.1 * i
    c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)],
                            [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]])
    np.savez(cvd_dir / f"batch{i:04d}.npz",
             img_1=(img.transpose(2, 0, 1)[None] / 255.0).astype(np.float32),
             depth=depth[None, None],
             K=k_true.T[None, None, None],
             cam_c2w=c2w[None])
  return cvd_dir


def test_save_monocular_cameras_matches_reference(tmp_path):
  rng = np.random.RandomState(3)
  ref_root = tmp_path / "ref"
  our_root = tmp_path / "ours"
  _write_inputs(ref_root, np.random.RandomState(3))
  _write_inputs(our_root, np.random.RandomState(3))
  del rng

  env = dict(os.environ, JAX_PLATFORMS="cpu")
  subprocess.run(
      [sys.executable, REF_SCRIPT,
       "--cvd_dir", str(ref_root / "cvd"),
       "--data_dir", str(ref_root)],
      check=True, capture_output=True, env=env)
  subprocess.run(
      [sys.executable, "-m", "dynibar_tpu.cli.save_monocular_cameras",
       "--data_path", str(our_root / "dense"),
       "--cvd_path", str(our_root / "cvd")],
      check=True, capture_output=True, env=env,
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

  want = np.load(ref_root / "dense" / "poses_bounds_cvd.npy")
  got = np.load(our_root / "dense" / "poses_bounds_cvd.npy")
  assert want.shape == got.shape == (N_FRAMES, 17)
  np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)

  import imageio.v2 as imageio
  for i in range(N_FRAMES):
    d_want = np.load(ref_root / "dense" / "disp" / f"{i:05d}.npy")
    d_got = np.load(our_root / "dense" / "disp" / f"{i:05d}.npy")
    np.testing.assert_allclose(d_got, d_want, rtol=1e-6, atol=1e-7,
                               err_msg=f"disp {i}")
    im_want = imageio.imread(ref_root / "dense" / "images_384x288"
                             / f"{i:05d}.png")
    im_got = imageio.imread(our_root / "dense" / "images_384x288"
                            / f"{i:05d}.png")
    np.testing.assert_array_equal(im_got, im_want, err_msg=f"image {i}")


def _load_ref_vv_module():
  """Import the reference render_source_vv module with its heavy deps
  (kornia / the CUDA splatting package / skimage) mocked out — only the
  pure-numpy pose math is exercised."""
  import importlib.util
  from unittest import mock
  mods = {"kornia": mock.MagicMock(), "kornia.filters": mock.MagicMock(),
          "splatting": mock.MagicMock(), "skimage": mock.MagicMock(),
          "skimage.morphology": mock.MagicMock()}
  with mock.patch.dict(sys.modules, mods):
    spec = importlib.util.spec_from_file_location(
        "ref_render_source_vv", "/root/reference/render_source_vv.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
  return module


def test_vv_wander_poses_match_reference():
  """llff.render_vv_wander_paths must reproduce the reference's two-cycle
  strided-phase pose picks (render_source_vv.py:68-116, 213-236)."""
  from dynibar_tpu.data import llff
  ref = _load_ref_vv_module()

  rng = np.random.RandomState(5)
  th = 0.3
  c2w = np.zeros((3, 5))
  c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)],
                          [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]])
  c2w[:3, 3] = rng.randn(3)
  c2w[:, 4] = [288.0, 384.0, 410.0]
  hwf = c2w[:, 4:5]
  bd_scale = 1.73

  got = llff.render_vv_wander_paths(c2w, bd_scale, num_samples=4)

  v0, n0 = ref.render_wander_path(c2w, hwf, bd_scale, 56 * 1.5,
                                  xyz=[0.0, 1.0, 1.0])
  v1, n1 = ref.render_wander_path(c2w, hwf, bd_scale, 48 * 1.5,
                                  xyz=[0.5, 1.0, 0.0])
  v0 = np.asarray(v0)
  v1 = np.asarray(v1)
  want = np.concatenate([
      v0[5:-1:int(n0 // 4)][:4, :3, :4],
      v1[15:-1:int(n1 // 4)][:4, :3, :4]], axis=0)
  np.testing.assert_allclose(got, want, atol=1e-12)


def test_render_source_vv_cli_end_to_end(tmp_path):
  """The full VV preprocessing chain: save_monocular_cameras output ->
  cli.render_source_vv -> reference-layout source_vv_poses.npy + pngs."""
  import imageio.v2 as imageio
  from dynibar_tpu.data import llff

  root = tmp_path / "scene"
  _write_inputs(root, np.random.RandomState(11))
  env = dict(os.environ, JAX_PLATFORMS="cpu")
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  # 72p keeps the 48 CPU softmax splats inside a CI budget
  subprocess.run(
      [sys.executable, "-m", "dynibar_tpu.cli.save_monocular_cameras",
       "--data_path", str(root / "dense"), "--cvd_path", str(root / "cvd"),
       "--height", "72"],
      check=True, capture_output=True, env=env, cwd=repo)
  subprocess.run(
      [sys.executable, "-m", "dynibar_tpu.cli.render_source_vv",
       "--data_path", str(root / "dense"), "--height", "72"],
      check=True, capture_output=True, env=env, cwd=repo)

  vv = np.load(root / "dense" / "source_vv_poses.npy")
  assert vv.shape == (8, 3, 4, N_FRAMES)        # reference layout
  assert np.isfinite(vv).all()

  rows = np.load(root / "dense" / "poses_bounds_cvd.npy")
  poses = rows[:, :-2].reshape(-1, 3, 5)
  bd_scale = float(rows[:, -2].min()) * 0.75
  for i in (0, N_FRAMES - 1):
    want = llff.render_vv_wander_paths(poses[i], bd_scale)
    np.testing.assert_allclose(np.moveaxis(vv, -1, 0)[i], want, atol=1e-6)
    # rotations preserved, translations displaced from the frame camera
    np.testing.assert_allclose(want[:, :, :3],
                               np.broadcast_to(poses[i, :3, :3], (8, 3, 3)),
                               atol=1e-12)
    assert np.abs(want[:, :, 3] - poses[i, :3, 3]).max() > 0

  for k in range(8):
    img = imageio.imread(
        root / "dense" / "source_virtual_views_96x72" / "00000"
        / f"{k:02d}.png")
    assert img.shape == (72, 96, 3)
    assert img.max() > 0                        # splat landed content
