"""Virtual source-view preprocessing.

Rebuild of reference render_source_vv.py:1-330: for every video frame,
forward-splat the RGBD frame (softmax splatting — here the JAX op in
ops/splat.py instead of the external CUDA package) to 8 poses drawn from
two "wander" cycles around the frame's camera
(data/llff.render_vv_wander_paths), write
``source_virtual_views_WxH/<frame>/<k>.png`` and ``source_vv_poses.npy``.

Faithful to the reference recipe:
  * pose amplitude scales with bd_scale = 0.75 * min over frames of the
    5th-percentile depth (the near bound saved by save_monocular_cameras);
  * splat importance is the TARGET-view disparity 1/z', min-max normalized
    to [-10, 10] (render_source_vv.py:63-68);
  * a Sobel soft alpha on depth/10 with beta=0.5 rides as the payload's
    4th channel (:118-128, :297-303); the rendered alpha is thresholded at
    0.5 and eroded with a radius-1 disk before masking the RGB (:321-326).

One knowing divergence: the reference warps with the optimizer's true
(scaled) intrinsics from the npz; this CLI reconstructs K from the saved
focal with a centered principal point — the only intrinsics the processed
scene layout carries (the downstream loader assumes the same).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def sobel_alpha(depth_over_10: np.ndarray, beta: float = 0.5) -> np.ndarray:
  """Soft alpha that fades depth edges (reference :118-128, beta=0.5 and
  depth/10 input per :297-303)."""
  import cv2
  gx = cv2.Sobel(depth_over_10, cv2.CV_32F, 1, 0, ksize=3)
  gy = cv2.Sobel(depth_over_10, cv2.CV_32F, 0, 1, ksize=3)
  grad = np.sqrt(gx ** 2 + gy ** 2)
  return np.exp(-beta * grad)


def forward_warp_rgbd(rgb255: np.ndarray, alpha: np.ndarray,
                      disp: np.ndarray, k: np.ndarray,
                      c2w_src: np.ndarray, c2w_dst: np.ndarray):
  """RGBD point cloud -> flow to dst view + softmax splat.

  Mirrors reference render_forward_splat (render_source_vv.py:15-66):
  payload [rgb*255 | alpha], importance = min-max-normalized target-view
  disparity scaled to [-10, 10].
  """
  import jax.numpy as jnp
  from dynibar_tpu.ops.splat import softmax_splat_jit

  h, w = disp.shape
  yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
  depth = 1.0 / np.maximum(disp, 1e-8)
  pix = np.stack([xx, yy, np.ones_like(xx)], axis=-1).astype(np.float64)
  kinv = np.linalg.inv(k[:3, :3])
  pts_cam = (pix @ kinv.T) * depth[..., None]
  pts_w = pts_cam @ c2w_src[:3, :3].T + c2w_src[:3, 3]
  w2c = np.linalg.inv(np.vstack([c2w_dst[:3], [0, 0, 0, 1]]))
  pts_dst = pts_w @ w2c[:3, :3].T + w2c[:3, 3]
  new_z = np.clip(pts_dst[..., 2], 1e-8, None)
  uv = pts_dst @ k[:3, :3].T
  uv = uv[..., :2] / np.clip(uv[..., 2:3], 1e-8, None)
  flow = (uv - pix[..., :2]).astype(np.float32)

  importance = (1.0 / new_z).astype(np.float32)
  imp_min, imp_max = importance.min(), importance.max()
  weights = (importance - imp_min) / (imp_max - imp_min + 1e-6) * 20.0 - 10.0

  payload = np.concatenate(
      [rgb255.astype(np.float32), alpha[..., None]], axis=-1)
  out = np.asarray(softmax_splat_jit(
      jnp.asarray(payload), jnp.asarray(flow), jnp.asarray(weights)))
  return out[..., :3], out[..., 3]


def _disk1_erosion(mask: np.ndarray) -> np.ndarray:
  """skimage.morphology.erosion(mask, disk(1)) equivalent (reference :321)."""
  import cv2
  kernel = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)
  return cv2.erode(mask.astype(np.uint8), kernel,
                   borderType=cv2.BORDER_REPLICATE).astype(bool)


def main():
  from dynibar_tpu.utils.platform import pin_platform_from_env
  pin_platform_from_env()
  import imageio.v2 as imageio

  from dynibar_tpu.data import llff

  ap = argparse.ArgumentParser()
  ap.add_argument("--data_path", required=True, help="<scene>/dense dir")
  ap.add_argument("--height", type=int, default=288)
  ap.add_argument("--num_vv", type=int, default=8,
                  help="total virtual views (split over the two cycles)")
  args = ap.parse_args()

  rows = np.load(os.path.join(args.data_path, "poses_bounds_cvd.npy"))
  poses = rows[:, :-2].reshape(-1, 3, 5)          # raw LLFF rows
  bounds = rows[:, -2:]
  num_frames = poses.shape[0]
  height = int(poses[0, 0, 4])
  width = int(poses[0, 1, 4])

  img_dir = os.path.join(args.data_path, f"images_{width}x{height}")
  img_files = sorted(os.listdir(img_dir))
  out_root = os.path.join(args.data_path,
                          f"source_virtual_views_{width}x{height}")
  os.makedirs(out_root, exist_ok=True)

  # amplitude scale: min over frames of the near (5th-percentile) depth
  # bound (reference render_source_vv.py:195-200)
  bd_scale = float(bounds[:, 0].min()) * 0.75
  num_samples = args.num_vv // 2

  all_vv_poses = np.zeros((num_frames, 2 * num_samples, 3, 4))
  for idx in range(num_frames):
    name = os.path.splitext(img_files[idx])[0]
    rgb = imageio.imread(os.path.join(img_dir, img_files[idx]))
    rgb255 = rgb[..., :3].astype(np.float32)
    if rgb.dtype != np.uint8:                     # floats arrive as [0,1]
      rgb255 = rgb255 * 255.0
    disp = np.load(os.path.join(args.data_path, "disp", name + ".npy"))

    focal = poses[idx, 2, 4]
    k = np.array([[focal, 0, width / 2.0],
                  [0, focal, height / 2.0],
                  [0, 0, 1.0]])

    vv = llff.render_vv_wander_paths(poses[idx], bd_scale,
                                     num_samples=num_samples)  # [2S,3,4]
    all_vv_poses[idx] = vv

    # LLFF -> OpenCV column permutation for warping (reference :243-251,
    # the involution [c1 | c0 | -c2 | t])
    def to_cv(p):
      return np.concatenate(
          [p[:, 1:2], p[:, 0:1], -p[:, 2:3], p[:, 3:4]], axis=1)

    c2w_src_cv = to_cv(poses[idx, :, :4])
    alpha = sobel_alpha(((1.0 / np.maximum(disp, 1e-8)) / 10.0
                         ).astype(np.float32))

    frame_dir = os.path.join(out_root, f"{idx:05d}")
    os.makedirs(frame_dir, exist_ok=True)
    for vi in range(2 * num_samples):
      rgb_out, a_out = forward_warp_rgbd(
          rgb255, alpha, disp, k, c2w_src_cv, to_cv(vv[vi]))
      mask = _disk1_erosion(a_out > 0.5)
      rgb_final = np.clip(rgb_out / 255.0, 0.0, 1.0) * mask[..., None]
      imageio.imwrite(os.path.join(frame_dir, f"{vi:02d}.png"),
                      (np.clip(rgb_final, 0, 1) * 255).astype(np.uint8))
    print(f"frame {idx}: wrote {2 * num_samples} virtual views")

  # reference file layout: [num_vv, 3, 4, num_frames], raw LLFF convention
  # (render_source_vv.py:237-241 saves the wander poses directly)
  np.save(os.path.join(args.data_path, "source_vv_poses.npy"),
          np.moveaxis(all_vv_poses, 0, -1).astype(np.float32))
  print("wrote source_vv_poses.npy")


if __name__ == "__main__":
  main()
