"""Virtual source-view preprocessing.

Rebuild of reference render_source_vv.py:1-330: for every video frame,
forward-splat the RGBD frame (softmax splatting — here the JAX op in
ops/splat.py instead of the external CUDA package) to 8 poses on a circular
"wander" path around the frame's camera, write
``source_virtual_views_WxH/<frame>/<k>.png`` and ``source_vv_poses.npy``.

A Sobel depth-edge soft alpha (render_source_vv.py:118) suppresses streaking
at depth discontinuities.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def sobel_alpha(disp: np.ndarray, beta: float = 10.0) -> np.ndarray:
  """Soft alpha that fades depth edges (reference :118-128)."""
  import cv2
  gx = cv2.Sobel(disp, cv2.CV_32F, 1, 0, ksize=3)
  gy = cv2.Sobel(disp, cv2.CV_32F, 0, 1, ksize=3)
  grad = np.sqrt(gx ** 2 + gy ** 2)
  return np.exp(-beta * grad)


def forward_warp_rgbd(rgb: np.ndarray, disp: np.ndarray, k: np.ndarray,
                      c2w_src: np.ndarray, c2w_dst: np.ndarray):
  """RGBD point cloud -> flow to dst view + splat with softmax weighting."""
  import jax.numpy as jnp
  from dynibar_tpu.ops.splat import softmax_splat_jit

  h, w = disp.shape
  yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
  depth = 1.0 / np.maximum(disp, 1e-6)
  pix = np.stack([xx, yy, np.ones_like(xx)], axis=-1).astype(np.float64)
  kinv = np.linalg.inv(k[:3, :3])
  pts_cam = (pix @ kinv.T) * depth[..., None]
  pts_w = pts_cam @ c2w_src[:3, :3].T + c2w_src[:3, 3]
  w2c = np.linalg.inv(np.vstack([c2w_dst[:3], [0, 0, 0, 1]]))
  pts_dst = pts_w @ w2c[:3, :3].T + w2c[:3, 3]
  z = np.maximum(pts_dst[..., 2], 1e-6)
  uv = (pts_dst @ k[:3, :3].T)
  uv = uv[..., :2] / uv[..., 2:3]
  flow = (uv - pix[..., :2]).astype(np.float32)

  alpha = sobel_alpha(disp.astype(np.float32))
  payload = np.concatenate(
      [rgb.astype(np.float32), alpha[..., None]], axis=-1)
  importance = (disp / disp.max() * 20.0).astype(np.float32)
  out = np.asarray(softmax_splat_jit(
      jnp.asarray(payload), jnp.asarray(flow), jnp.asarray(importance)))
  rgb_out, a_out = out[..., :3], out[..., 3:]
  return rgb_out * (a_out > 0.3), flow


def main():
  import imageio.v2 as imageio
  from dynibar_tpu.data import llff

  ap = argparse.ArgumentParser()
  ap.add_argument("--data_path", required=True, help="<scene>/dense dir")
  ap.add_argument("--height", type=int, default=288)
  ap.add_argument("--num_vv", type=int, default=8)
  args = ap.parse_args()

  meta = llff.load_scene_poses(args.data_path, height=args.height,
                               with_vv=False, recenter=False)
  poses, imgfiles = meta["poses"], meta["imgfiles"]
  scale = meta["scale"]
  num_frames = len(imgfiles)

  first = imageio.imread(imgfiles[0]).astype(np.float32) / 255.0
  h, w = first.shape[:2]
  out_root = os.path.join(
      args.data_path,
      os.path.basename(os.path.dirname(imgfiles[0])).replace(
          "images", "source_virtual_views"))
  os.makedirs(out_root, exist_ok=True)

  all_vv_poses = []
  for idx in range(num_frames):
    rgb = imageio.imread(imgfiles[idx]).astype(np.float32) / 255.0
    name = os.path.splitext(os.path.basename(imgfiles[idx]))[0]
    disp = np.load(os.path.join(args.data_path, "disp", name + ".npy"))
    disp = disp / scale

    hwf = poses[idx][:, 4]
    focal = hwf[2]
    k = np.array([[focal, 0, w / 2.0], [0, focal, h / 2.0], [0, 0, 1.0]])
    c2w = np.eye(4)
    c2w[:3, :4] = poses[idx][:3, :4]
    # back to OpenCV convention for warping
    c2w_cv = c2w.copy()
    c2w_cv[:, 1:3] *= -1

    wander = llff.render_wander_path(poses[idx], num_frames=args.num_vv,
                                     max_disp=24.0)
    frame_dir = os.path.join(out_root, f"{idx:05d}")
    os.makedirs(frame_dir, exist_ok=True)
    frame_poses = []
    for vi, vpose in enumerate(wander):
      c2w_dst = np.eye(4)
      c2w_dst[:3, :4] = vpose[:3, :4]
      c2w_dst_cv = c2w_dst.copy()
      c2w_dst_cv[:, 1:3] *= -1
      warped, _ = forward_warp_rgbd(rgb[..., :3], disp, k,
                                    c2w_cv[:3], c2w_dst_cv[:3])
      imageio.imwrite(os.path.join(frame_dir, f"{vi:02d}.png"),
                      (np.clip(warped, 0, 1) * 255).astype(np.uint8))
      frame_poses.append(vpose)
    all_vv_poses.append(np.stack(frame_poses))
    print(f"frame {idx}: wrote {args.num_vv} virtual views")

  # reference file layout: [num_vv, 3, 4, num_frames] 3x4 poses in the *raw*
  # LLFF column convention (render_source_vv.py:237-240) — the loader applies
  # the [c1, -c0, c2] swap, so invert it here ([-c1, c0, c2]).
  stacked = np.stack(all_vv_poses)[:, :, :3, :4]     # [N, num_vv, 3, 4]
  stacked = np.concatenate(
      [-stacked[:, :, :, 1:2], stacked[:, :, :, 0:1], stacked[:, :, :, 2:]],
      axis=3)
  np.save(os.path.join(args.data_path, "source_vv_poses.npy"),
          np.moveaxis(stacked, 0, -1).astype(np.float32))
  print("wrote source_vv_poses.npy")


if __name__ == "__main__":
  main()
