"""LLFF-format pose I/O, recentering, and render-path generation.

Host-side numpy (runs in the input pipeline, not on device).  Behavioral
parity targets (reference ibrnet/data_loaders/llff_data_utils.py):
  * ``parse_llff_pose`` axis-swap conventions (:14-25)
  * ``_load_data`` poses_bounds_cvd.npy layout (:57-123)
  * ``recenter_poses`` / ``recenter_poses_mono`` (:173-213)
  * render paths: spiral (:155-170), wander (:413-450),
    stabilization (:453-497)
  * ``load_llff_data`` (:216-318) / ``load_mono_data`` (:321-410)
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def _normalize(x):
  return x / np.linalg.norm(x)


def parse_llff_pose(pose: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
  """LLFF 3x5 pose -> (4x4 intrinsics, 4x4 c2w in OpenCV convention)."""
  h, w, f = pose[:3, -1]
  c2w = np.eye(4)
  c2w[:3] = pose[:3, :4]
  c2w[:, 1:3] *= -1
  intrinsics = np.array(
      [[f, 0, w / 2.0, 0], [0, f, h / 2.0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
  return intrinsics, c2w


def batch_parse_llff_poses(poses: np.ndarray):
  pairs = [parse_llff_pose(p) for p in poses]
  return (np.stack([p[0] for p in pairs]).astype(np.float32),
          np.stack([p[1] for p in pairs]).astype(np.float32))


def batch_parse_vv_poses(poses: np.ndarray) -> np.ndarray:
  """[N, M, 3, 5] virtual-view LLFF poses -> [N, M, 4, 4] c2w."""
  out = np.stack([
      np.stack([parse_llff_pose(p)[1] for p in per_frame])
      for per_frame in poses])
  return out.astype(np.float32)


def load_poses_bounds(basedir: str, pose_file: str = "poses_bounds_cvd.npy"
                      ) -> Tuple[np.ndarray, np.ndarray]:
  """Read poses_bounds -> (poses [3,5,N], bds [2,N])."""
  path = os.path.join(basedir, pose_file)
  if not os.path.exists(path):
    raise SystemExit(
        f"error: {path} not found — expected the reference dataset layout "
        "<folder_path>/<scene>/dense/{poses_bounds_cvd.npy, images_WxH/, "
        "disp/, flow_i*/; run the preprocessing CLIs first)")
  arr = np.load(path)
  poses = arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
  bds = arr[:, -2:].transpose([1, 0])
  return poses, bds


def list_images(imgdir: str) -> List[str]:
  return [os.path.join(imgdir, f) for f in sorted(os.listdir(imgdir))
          if f.lower().endswith(("jpg", "png", "jpeg"))]


def viewmatrix(z, up, pos):
  vec2 = _normalize(z)
  vec0 = _normalize(np.cross(up, vec2))
  vec1 = _normalize(np.cross(vec2, vec0))
  return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses: np.ndarray) -> np.ndarray:
  hwf = poses[0, :3, -1:]
  center = poses[:, :3, 3].mean(0)
  vec2 = _normalize(poses[:, :3, 2].sum(0))
  up = poses[:, :3, 1].sum(0)
  return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def recenter_poses(poses: np.ndarray) -> np.ndarray:
  poses_ = poses + 0
  bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
  c2w = np.concatenate([poses_avg(poses)[:3, :4], bottom], -2)
  bottom = np.tile(bottom[None], [poses.shape[0], 1, 1])
  p = np.concatenate([poses[:, :3, :4], bottom], -2)
  p = np.linalg.inv(c2w) @ p
  poses_[:, :3, :4] = p[:, :3, :4]
  return poses_


def recenter_poses_mono(poses: np.ndarray, src_vv_poses: np.ndarray):
  """Recenter video + virtual-view poses jointly (reference :188-213)."""
  hwf = poses[:, :, 4:5]
  poses_ = poses + 0
  bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
  c2w = np.concatenate([poses_avg(poses)[:3, :4], bottom], -2)
  bottom_t = np.tile(bottom[None], [poses.shape[0], 1, 1])
  p = np.concatenate([poses[:, :3, :4], bottom_t], -2)
  p = np.linalg.inv(c2w) @ p
  poses_[:, :3, :4] = p[:, :3, :4]

  num_vv = src_vv_poses.shape[1]
  out = np.zeros((num_vv, src_vv_poses.shape[0], src_vv_poses.shape[2],
                  src_vv_poses.shape[3] + 1))
  for i in range(num_vv):
    vv = np.concatenate([src_vv_poses[:, i, :3, :4], bottom_t], -2)
    vv = np.linalg.inv(c2w) @ vv
    out[i] = np.concatenate([vv[:, :3, :], hwf], 2)
  return poses_, np.moveaxis(out, 1, 0)


def render_path_spiral(c2w, up, rads, focal, zdelta, zrate, rots, n):
  render_poses = []
  rads = np.array(list(rads) + [1.0])
  hwf = c2w[:, 4:5]
  for theta in np.linspace(0.0, 2.0 * np.pi * rots, n + 1)[:-1]:
    c = np.dot(c2w[:3, :4],
               np.array([np.cos(theta), -np.sin(theta),
                         -np.sin(theta * zrate), 1.0]) * rads)
    z = _normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
    render_poses.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
  return render_poses


def render_wander_path(c2w: np.ndarray, num_frames: int = 50,
                       max_disp: float = 48.0) -> List[np.ndarray]:
  """Circular in-place camera path around one frame (reference :413-450)."""
  hwf = c2w[:, 4:5]
  max_trans = max_disp / hwf[2][0]
  out = []
  for i in range(num_frames):
    x_t = max_trans * np.sin(2.0 * np.pi * i / num_frames)
    z_t = max_trans * np.cos(2.0 * np.pi * i / num_frames) / 2.0
    i_pose = np.eye(4)
    i_pose[:3, 3] = [x_t, 0.0, z_t]
    i_pose = np.linalg.inv(i_pose)
    ref = np.concatenate([c2w[:3, :4], np.array([[0, 0, 0, 1.0]])], 0)
    render_pose = ref @ i_pose
    out.append(np.concatenate([render_pose[:3, :], hwf], 1))
  return out


def render_stabilization_path(poses: np.ndarray, k_size: int
                              ) -> List[np.ndarray]:
  """Gaussian-smoothed camera path (reference :453-497), cv2-free.

  Replicates cv2.getGaussianKernel(k, sigma=-1) + filter2D with BORDER_REFLECT_101.
  """
  hwf = poses[0, :, 4:5]
  num_frames = poses.shape[0]
  rows = np.stack([np.concatenate(
      [poses[i, :3, 0:1], poses[i, :3, 1:2], poses[i, :3, 3:4]], axis=-1)
      for i in range(num_frames)])                           # [N, 3, 3]

  sigma = 0.3 * ((k_size - 1) * 0.5 - 1) + 0.8
  xs = np.arange(k_size) - (k_size - 1) / 2.0
  kernel = np.exp(-(xs ** 2) / (2 * sigma ** 2))
  kernel /= kernel.sum()

  def smooth(signal):  # [N, 3] column signal
    padded = np.pad(signal, ((k_size // 2, k_size // 2), (0, 0)),
                    mode="reflect")
    return np.stack([np.convolve(padded[:, c], kernel, mode="valid")
                     for c in range(signal.shape[1])], axis=-1)

  r1 = smooth(rows[:, :, 0])
  r2 = smooth(rows[:, :, 1])
  t = smooth(rows[:, :, 2])
  r1 = r1 / np.linalg.norm(r1, axis=-1, keepdims=True)
  r2 = r2 / np.linalg.norm(r2, axis=-1, keepdims=True)

  out = []
  for i in range(num_frames):
    r3 = np.cross(r1[i], r2[i])
    pose = np.concatenate(
        [r1[i][:, None], r2[i][:, None], r3[:, None], t[i][:, None]], axis=-1)
    out.append(np.concatenate([pose[:3, :], hwf], 1))
  return out


def load_scene_poses(
    basedir: str,
    height: int = 288,
    bd_factor: float = 0.75,
    recenter: bool = True,
    with_vv: bool = False,
    render_idx: int = -1,
    num_avg_imgs: Optional[int] = None,
):
  """Shared loading path of load_llff_data / load_mono_data (no image IO).

  Returns dict with poses [N,3,5], bds [2,N], scale, imgfiles, render_poses,
  and (mono) src_vv_poses.
  """
  poses, bds = load_poses_bounds(basedir)

  imgdir_base = os.path.join(basedir, "images")
  img0 = list_images(imgdir_base)[0]
  import imageio.v2 as imageio  # local import: heavy
  sh = imageio.imread(img0).shape
  factor = sh[0] / float(height)
  width = int(round(sh[1] / factor))
  imgdir = os.path.join(basedir, f"images_{width}x{height}")
  imgfiles = list_images(imgdir) if os.path.exists(imgdir) else []
  if imgfiles:
    sh = imageio.imread(imgfiles[0]).shape
  poses[:2, 4, :] = np.array(sh[:2]).reshape([2, 1])

  # axis swap: LLFF [down, right, back] -> [right, up, back] style
  poses = np.concatenate(
      [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
  poses = np.moveaxis(poses, -1, 0).astype(np.float32)
  bds = np.moveaxis(bds, -1, 0).astype(np.float32)

  scale = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
  poses[:, :3, 3] *= scale
  bds = bds * scale

  src_vv_poses = None
  if with_vv:
    # file layout: [num_vv, 3, 4, num_frames] 3x4 c2w (no hwf column),
    # written by the virtual-view preprocessor
    # (reference render_source_vv.py:237-240)
    vv = np.load(os.path.join(basedir, "source_vv_poses.npy"))
    # same LLFF->world column swap as the video poses
    vv = np.concatenate(
        [vv[:, :, 1:2, :], -vv[:, :, 0:1, :], vv[:, :, 2:, :]], 2)
    vv = np.moveaxis(vv, -1, 0).astype(np.float32)   # [N, num_vv, 3, 4]
    vv[..., :3, 3] *= scale
    if recenter:
      poses, src_vv_poses = recenter_poses_mono(poses, vv)
    else:
      # append hwf so downstream always sees 3x5 LLFF poses
      hwf = np.broadcast_to(poses[:, None, :, 4:5],
                            vv.shape[:2] + (3, 1))
      src_vv_poses = np.concatenate([vv, hwf], axis=-1)
  elif recenter:
    poses = recenter_poses(poses)

  # render path
  if with_vv:
    if render_idx >= 0:
      render_poses = render_wander_path(poses[render_idx])
    else:
      render_poses = render_stabilization_path(poses, k_size=45)
  else:
    c2w = poses_avg(poses[: (num_avg_imgs or len(poses))])
    up = _normalize(poses[:, :3, 1].sum(0))
    close, inf = bds.min() * 0.9, bds.max() * 2.0
    dt = 0.75
    focal = 1.5 / ((1.0 - dt) / close + dt / inf)
    zdelta = close * 0.2
    rads = np.percentile(np.abs(poses[:, :3, 3]), 80, 0)
    render_poses = render_path_spiral(
        c2w, up, rads, focal, zdelta, zrate=0.5, rots=2, n=120)

  return {
      "poses": poses,
      "bds": bds,
      "scale": scale,
      "imgfiles": imgfiles,
      "render_poses": np.array(render_poses).astype(np.float32),
      "src_vv_poses": src_vv_poses,
  }
