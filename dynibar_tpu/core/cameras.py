"""Camera codec and ray generation.

The universal camera format is 34 floats ``[H, W, K.flatten(16),
c2w.flatten(16)]`` (reference: ibrnet/sample_ray.py:11-16).  Pose convention
is OpenCV-style camera-to-world after the LLFF axis swap
(reference: ibrnet/data_loaders/llff_data_utils.py:14-25).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# geometry must not run through the MXU's fast-bf16 passes: pixel-accurate
# projection needs full f32 matmuls (this backend defaults to bf16 precision)
HIGHEST = jax.lax.Precision.HIGHEST


def make_camera(h: int, w: int, intrinsics, c2w) -> np.ndarray:
  """Pack a 34-float camera vector (numpy, host-side)."""
  return np.concatenate(
      [np.array([h, w], dtype=np.float32),
       np.asarray(intrinsics, dtype=np.float32).reshape(16),
       np.asarray(c2w, dtype=np.float32).reshape(16)]
  ).astype(np.float32)


def split_camera(camera: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray, jnp.ndarray]:
  """[..., 34] -> (H, W, K [...,4,4], c2w [...,4,4])."""
  h = camera[..., 0]
  w = camera[..., 1]
  k = camera[..., 2:18].reshape(camera.shape[:-1] + (4, 4))
  c2w = camera[..., 18:34].reshape(camera.shape[:-1] + (4, 4))
  return h, w, k, c2w


def invert_pose(c2w: jnp.ndarray) -> jnp.ndarray:
  """Rigid-transform inverse of [..., 4, 4] camera-to-world matrices.

  Uses the closed form (Rᵀ, -Rᵀt) instead of a general solve — exact and
  cheaper on TPU than jnp.linalg.inv.
  """
  r = c2w[..., :3, :3]
  t = c2w[..., :3, 3:]
  rt = jnp.swapaxes(r, -1, -2)
  top = jnp.concatenate(
      [rt, -jnp.matmul(rt, t, precision=HIGHEST)], axis=-1)
  bottom = jnp.broadcast_to(
      jnp.array([0.0, 0.0, 0.0, 1.0], dtype=c2w.dtype),
      c2w.shape[:-2] + (1, 4))
  return jnp.concatenate([top, bottom], axis=-2)


def pixel_rays(h: int, w: int, intrinsics: jnp.ndarray,
               c2w: jnp.ndarray, stride: int = 1
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """All-pixel ray origins/directions for one camera.

  Parity with reference sample_ray.py:143-163: pixel grid is (u=x, v=y) with
  no half-pixel offset; direction = c2w[:3,:3] @ K^{-1} @ [u, v, 1].

  Returns (rays_o [N,3], rays_d [N,3], uv [N,2]) with N = ceil(H/stride)*ceil(W/stride).
  """
  u = jnp.arange(0, w, stride, dtype=jnp.float32)
  v = jnp.arange(0, h, stride, dtype=jnp.float32)
  uu, vv = jnp.meshgrid(u, v)  # [H', W']
  uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)  # [N,2] (x, y)
  ones = jnp.ones_like(uv[..., :1])
  pix = jnp.concatenate([uv, ones], axis=-1)  # [N,3]
  k3 = intrinsics[:3, :3]
  kinv = jnp.linalg.inv(k3)
  dirs = jnp.matmul(
      c2w[:3, :3], jnp.matmul(kinv, pix.T, precision=HIGHEST),
      precision=HIGHEST).T  # [N,3]
  origins = jnp.broadcast_to(c2w[:3, 3], dirs.shape)
  return origins, dirs, uv


def intrinsics_from_hwf(h: float, w: float, f: float) -> np.ndarray:
  """LLFF hwf -> 4x4 K (reference llff_data_utils.py:22-24)."""
  return np.array(
      [[f, 0, w / 2.0, 0], [0, f, h / 2.0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
      dtype=np.float32)
