"""Volume-rendering composition of the static + dynamic fields.

Behavioral parity targets in the reference (ibrnet/render_ray.py):
  * ``raw2outputs``          (:214-330) — joint two-field alpha composition
    alpha = 1 - (1 - alpha_st)(1 - alpha_dy)
  * ``raw2outputs_vanilla``  (:134-211) — single-field composition
  * ``compute_optical_flow`` (:333-358) — render-derived 2D flow

Conventions preserved: softplus density activation, unit interval distances
with a 1e10 tail (USE_DISTANCE=False / USE_SOFTPLUS=True at render_ray.py:14-16),
cumprod transmittance with the 1e-10 epsilon, and the ">8 valid samples"
per-ray mask.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dynibar_tpu.core import cameras as cam


def _sigma2alpha(sigma: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
  return 1.0 - jnp.exp(-jax.nn.softplus(sigma) * dists)


def _unit_dists(z_vals: jnp.ndarray) -> jnp.ndarray:
  dists = jnp.ones_like(z_vals[..., 1:])
  tail = jnp.full_like(z_vals[..., :1], 1e10)
  return jnp.concatenate([dists, tail], axis=-1)


def _transmittance(alpha: jnp.ndarray) -> jnp.ndarray:
  t = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)[..., :-1]
  return jnp.concatenate([jnp.ones_like(t[..., :1]), t], axis=-1)


def composite_single(raw: jnp.ndarray, z_vals: jnp.ndarray,
                     pixel_mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
  """Single-field composition (raw2outputs_vanilla).

  raw: [R, S, 4]; z_vals: [R, S]; pixel_mask: [R, S] bool.
  """
  rgb = raw[..., :3]
  sigma = raw[..., 3]
  alpha = _sigma2alpha(sigma, _unit_dists(z_vals))
  t = _transmittance(alpha)
  weights = alpha * t
  rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
  depth_map = jnp.sum(weights * z_vals, axis=-1)
  mask = jnp.sum(pixel_mask.astype(jnp.float32), axis=-1) > 8
  return {
      "rgb": rgb_map,
      "depth": depth_map,
      "weights": weights,
      "mask": mask,
      "alpha": alpha,
      "z_vals": z_vals,
  }


def composite_dual(raw_dy: jnp.ndarray, raw_st: jnp.ndarray,
                   z_vals: jnp.ndarray, mask_dy: jnp.ndarray,
                   mask_st: jnp.ndarray) -> Dict[str, jnp.ndarray]:
  """Two-field composition (raw2outputs)."""
  rgb_dy, sigma_dy = raw_dy[..., :3], raw_dy[..., 3]
  rgb_st, sigma_st = raw_st[..., :3], raw_st[..., 3]
  dists = _unit_dists(z_vals)
  alpha_dy = _sigma2alpha(sigma_dy, dists)
  alpha_st = _sigma2alpha(sigma_st, dists)

  alpha = 1.0 - (1.0 - alpha_st) * (1.0 - alpha_dy)
  t = _transmittance(alpha)

  weights_dy = alpha_dy * t
  weights_st = alpha_st * t
  weights = alpha * t

  rgb_map_dy = jnp.sum(weights_dy[..., None] * rgb_dy, axis=-2)
  rgb_map_st = jnp.sum(weights_st[..., None] * rgb_st, axis=-2)
  depth_map = jnp.sum(weights * z_vals, axis=-1)
  depth_map_dy = jnp.sum(weights_dy * z_vals, axis=-1)

  mask = ((jnp.sum(mask_dy.astype(jnp.float32), axis=-1) > 8)
          | (jnp.sum(mask_st.astype(jnp.float32), axis=-1) > 8))
  return {
      "rgb": rgb_map_dy + rgb_map_st,
      "rgb_static": rgb_map_st,
      "rgb_dy": rgb_map_dy,
      "depth": depth_map,
      "depth_dy": depth_map_dy,
      "alpha_dy": alpha_dy,
      "weights_dy": weights_dy,
      "weights_st": weights_st,
      "alpha": alpha,
      "weights": weights,
      "mask": mask,
      "z_vals": z_vals,
  }


def render_optical_flow(weights: jnp.ndarray, pts_3d_seq: jnp.ndarray,
                        src_cameras: jnp.ndarray, uv_grid: jnp.ndarray
                        ) -> jnp.ndarray:
  """2D optical flow from the expected 3D trajectory point.

  weights: [R, S]; pts_3d_seq: [V, R, S, 3]; src_cameras: [V, 34];
  uv_grid: [R, 2].  Returns [V, R, 2] (reference render_ray.py:333-358).
  """
  _, _, k, c2w = cam.split_camera(src_cameras)
  w2c = cam.invert_pose(c2w)
  exp_pts = jnp.sum(weights[None, ..., None] * pts_3d_seq, axis=-2)  # [V,R,3]
  pts_src = (jnp.einsum("vij,vrj->vri", w2c[:, :3, :3], exp_pts,
                        precision=cam.HIGHEST)
             + w2c[:, None, :3, 3])
  pix = jnp.einsum("vij,vrj->vri", k[:, :3, :3], pts_src,
                   precision=cam.HIGHEST)
  # Guarded perspective divide (same policy as projection.project_points):
  # the reference divides unguarded (render_ray.py:352-354), but a ray with
  # zero source coverage has weights == 0, so exp_pts == 0 and the divide is
  # 0/0 — the resulting NaN poisons the masked flow loss (NaN * 0 = NaN).
  # Identical to the reference wherever its value is finite.
  z = pix[..., -1:]
  z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
  pix = pix / z
  return jnp.clip(pix[..., :2], -1e6, 1e6) - uv_grid[None]
