"""Epipolar projection of 3D sample points into source views.

Rebuild of the reference ``Projector`` (ibrnet/projection.py:7-176) as pure
functions batched over views with fixed shapes.  The bilinear image/feature
gather lives in :mod:`dynibar_tpu.ops.grid_sample`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dynibar_tpu.core import cameras as cam
from dynibar_tpu.ops.grid_sample import bilinear_sample_views
from dynibar_tpu.ops.pallas_sample import pallas_bilinear_sample_views
from dynibar_tpu.ops.strip_sample import strip_sample_views


def project_points(
    xyz: jnp.ndarray,            # [V, R, S, 3] (already per-view displaced)
    src_cameras: jnp.ndarray,    # [V, 34]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """World points -> pixel locations in each source view.

  Parity with reference projection.py:32-59 (clamped perspective divide,
  in-front mask from positive depth).

  Returns (pixel_xy [V,R,S,2], in_front [V,R,S]).
  """
  _, _, k, c2w = cam.split_camera(src_cameras)
  w2c = cam.invert_pose(c2w)                       # [V,4,4]
  proj_mat = jnp.einsum("vij,vjk->vik", k, w2c,
                        precision=cam.HIGHEST)     # [V,4,4]
  xyz_h = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], axis=-1)
  proj = jnp.einsum("vij,vrsj->vrsi", proj_mat, xyz_h,
                    precision=cam.HIGHEST)         # [V,R,S,4]
  z = jnp.maximum(proj[..., 2:3], 1e-8)
  pix = proj[..., :2] / z
  pix = jnp.clip(pix, -1e6, 1e6)
  in_front = proj[..., 2] > 0
  return pix, in_front


def inbound_mask(pixel_xy: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray
                 ) -> jnp.ndarray:
  """Valid-pixel mask (reference projection.py:13-20)."""
  x, y = pixel_xy[..., 0], pixel_xy[..., 1]
  return (x >= 0) & (x <= w - 1.0) & (y >= 0) & (y <= h - 1.0)


def ray_angle_features(
    xyz_st: jnp.ndarray,        # [R, S, 3] reference (undisplaced) points
    xyz: jnp.ndarray,           # [V, R, S, 3] displaced points
    query_camera: jnp.ndarray,  # [34]
    src_cameras: jnp.ndarray,   # [V, 34]
) -> jnp.ndarray:
  """Viewing-angle difference feature (reference projection.py:61-101).

  Direction from the *undisplaced* point to the target camera vs direction
  from the *displaced* point to each source camera:
  [normalized(diff)_xyz, dot] -> [V, R, S, 4], stop-gradient applied by the
  caller (the reference `.detach()`es this).
  """
  _, _, _, q_c2w = cam.split_camera(query_camera)
  _, _, _, s_c2w = cam.split_camera(src_cameras)
  tar_pos = q_c2w[:3, 3]                     # [3]
  src_pos = s_c2w[:, :3, 3]                  # [V,3]

  def _norm(v):
    # torch.nn.functional.normalize semantics: v / max(||v||, 1e-12)
    return v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

  ray2tar = _norm(tar_pos[None, None, None, :] - xyz_st[None])   # [1,R,S,3]
  ray2src = _norm(src_pos[:, None, None, :] - xyz)               # [V,R,S,3]
  diff = ray2tar - ray2src
  dot = jnp.sum(ray2tar * ray2src, axis=-1, keepdims=True)
  diff_dir = _norm(diff)
  return jnp.concatenate([diff_dir, dot], axis=-1)               # [V,R,S,4]


def compute_with_motions_cm(
    xyz_st: jnp.ndarray,        # [R, S, 3]
    xyz: jnp.ndarray,           # [V, R, S, 3]
    query_camera: jnp.ndarray,  # [34]
    src_rgbs: jnp.ndarray,      # [V, H, W, 3]
    src_cameras: jnp.ndarray,   # [V, 34]
    featmaps: jnp.ndarray,      # [V, Hf, Wf, C]
    view_valid: jnp.ndarray,    # [V] 0/1 padding mask
    fused_rgb: bool = False,
    cov_out: Optional[list] = None,
) -> Dict[str, jnp.ndarray]:
  """CHANNEL-MAJOR twin of :func:`compute_with_motions` for the fused
  eval path (Pallas sampler -> fused Pallas aggregators).

  The windowed sampler's native output is [V, C, N] (N = R*S, ray-major)
  and the fused aggregators consume feature-major [V, C', N] tiles of the
  identical point ordering — the default path's [R,S,V,3+C] interchange
  forces ~6 full-tensor transposes/concats between the two kernels.  This
  path keeps everything channel-major: the only materializations left are
  one axis-1 concat per aggregator input and the (small, 4-channel)
  ray-diff relayout.  Eval-only (forward semantics identical; the
  training path keeps the exact gather + [R,S,V,·] interchange).

  Returns dict: rgbfeat_cm [V, 3+C, N] (or [V, C, N] under fused_rgb),
  raydiff_cm [V, 4, N], mask_cm [V, 1, N] (float), pixel_mask [R, S].
  """
  from dynibar_tpu.ops.pallas_sample import pallas_bilinear_sample_views
  v, r, s, _ = xyz.shape
  h = src_cameras[0, 0]
  w = src_cameras[0, 1]
  pixel_xy, in_front = project_points(xyz, src_cameras)          # [V,R,S,2]
  resize = jnp.stack([w - 1.0, h - 1.0])
  grid = 2.0 * pixel_xy / resize - 1.0

  interp = jax.default_backend() != "tpu"
  feats_cm, covered = pallas_bilinear_sample_views(
      featmaps, grid, interpret=interp, layout="cm")             # [V,C,N]
  if fused_rgb:
    rgbfeat_cm = feats_cm
  else:
    rgbs_cm, cov_rgb = pallas_bilinear_sample_views(
        src_rgbs, grid, interpret=interp, layout="cm")           # [V,3,N]
    covered = covered & cov_rgb
    rgbfeat_cm = jnp.concatenate([rgbs_cm, feats_cm], axis=1)

  mask = (inbound_mask(pixel_xy, h, w) & in_front)               # [V,R,S]
  mask = mask & (view_valid[:, None, None] > 0)
  if cov_out is not None:
    cov_out.append(jnp.all(covered | ~mask))
  mask = mask & covered
  mask_cm = mask.reshape(v, 1, r * s).astype(rgbfeat_cm.dtype)

  ray_diff = jax.lax.stop_gradient(
      ray_angle_features(xyz_st, xyz, query_camera, src_cameras))
  raydiff_cm = jnp.transpose(ray_diff, (0, 3, 1, 2)).reshape(v, 4, r * s)

  pixel_mask = jnp.sum(mask_cm[:, 0, :].astype(jnp.float32),
                       axis=0).reshape(r, s) > 1
  return {"rgbfeat_cm": rgbfeat_cm, "raydiff_cm": raydiff_cm,
          "mask_cm": mask_cm, "pixel_mask": pixel_mask}


def compute_with_motions(
    xyz_st: jnp.ndarray,        # [R, S, 3]
    xyz: jnp.ndarray,           # [V, R, S, 3]
    query_camera: jnp.ndarray,  # [34]
    src_rgbs: jnp.ndarray,      # [V, H, W, 3]
    src_cameras: jnp.ndarray,   # [V, 34]
    featmaps: jnp.ndarray,      # [V, Hf, Wf, C]
    view_valid: jnp.ndarray,    # [V] 0/1 padding mask
    fused_rgb: bool = False,
    strip: Optional[Tuple[int, int]] = None,
    strip_impl: str = "pallas",
    cov_out: Optional[list] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Project, gather RGB+features, compute angle features and masks.

  Parity with reference projection.py:103-176 with one extension: a per-view
  validity mask folds padded views out of the aggregation (ragged view counts
  become pad-to-max; see SURVEY.md §7 "Ragged view counts").

  fused_rgb=True expects `featmaps` to carry the (downsampled) RGB as its
  first 3 channels and skips the separate full-res image gather — the
  opt-in speed mode (gathers dominate the render step).

  strip=(rows, cols) switches the feature-map lookup to epipolar-strip
  sampling (ops/strip_sample.py) — one strip gather per (ray, view) instead
  of one descriptor per sample; samples whose segment escapes the strip are
  folded out through the validity mask.

  cov_out (a list, appended to) receives one traced bool scalar: True iff
  every otherwise-valid sample was covered by its strip/window — the signal
  render_image's auto-exact fallback re-renders a chunk on.

  Returns:
    rgb_feat [R, S, V, 3+C], ray_diff [R, S, V, 4], mask [R, S, V, 1].
  """
  v, r, s, _ = xyz.shape
  h = src_cameras[0, 0]
  w = src_cameras[0, 1]

  pixel_xy, in_front = project_points(xyz, src_cameras)          # [V,R,S,2]

  # normalized coords in [-1, 1] (align_corners=True convention) are shared
  # between the RGB image and the (lower-resolution) feature map
  resize = jnp.stack([w - 1.0, h - 1.0])
  grid = 2.0 * pixel_xy / resize - 1.0                           # [V,R,S,2]
  grid_flat = grid.reshape(v, r * s, 2)

  covered = None
  if strip is not None:
    if strip_impl == "pallas":
      # interpret mode keeps the CPU test mesh working; Mosaic compiles on
      # real TPUs only.  Eval-only (see _strip_arg): gradient-bearing
      # steps always take the exact gather below.
      interp = jax.default_backend() != "tpu"
      feats, covered = pallas_bilinear_sample_views(
          featmaps, grid, interpret=interp)
      if not fused_rgb:
        # full-res source colors through the same kernel (32-row windows)
        rgbs, cov_rgb = pallas_bilinear_sample_views(
            src_rgbs, grid, interpret=interp)
        covered = covered & cov_rgb
    else:
      feats, covered = strip_sample_views(featmaps, grid,
                                          rows=strip[0], cols=strip[1])
      if not fused_rgb:
        rgbs = bilinear_sample_views(src_rgbs, grid_flat,
                                     image_grad=False).reshape(v, r, s, -1)
    if fused_rgb:
      rgb_feat = feats                                           # [V,R,S,3+C]
    else:
      rgb_feat = jnp.concatenate([rgbs, feats], axis=-1)
  elif fused_rgb:
    rgb_feat = bilinear_sample_views(featmaps, grid_flat,
                                     image_grad=True)            # [V,N,3+C]
    rgb_feat = rgb_feat.reshape(v, r, s, -1)
  else:
    # source images are data (no parameter gradient); feature maps are the
    # feature net's output and need the image-gradient path
    rgbs = bilinear_sample_views(src_rgbs, grid_flat,
                                 image_grad=False)               # [V,R*S,3]
    feats = bilinear_sample_views(featmaps, grid_flat,
                                  image_grad=True)               # [V,R*S,C]
    rgb_feat = jnp.concatenate([rgbs, feats], axis=-1).reshape(v, r, s, -1)

  mask = (inbound_mask(pixel_xy, h, w) & in_front)               # [V,R,S]
  mask = mask & (view_valid[:, None, None] > 0)
  if covered is not None:
    if cov_out is not None:
      # "covered or wasn't going to contribute anyway"
      cov_out.append(jnp.all(covered | ~mask))
    mask = mask & covered
  elif cov_out is not None:
    cov_out.append(jnp.asarray(True))

  # the reference detaches the angle feature (projection.py:169)
  ray_diff = jax.lax.stop_gradient(
      ray_angle_features(xyz_st, xyz, query_camera, src_cameras))

  # reorder to [R, S, V, ...] like the reference's permute
  rgb_feat = jnp.transpose(rgb_feat, (1, 2, 0, 3))
  ray_diff = jnp.transpose(ray_diff, (1, 2, 0, 3))
  mask = jnp.transpose(mask, (1, 2, 0)).astype(rgb_feat.dtype)[..., None]
  return rgb_feat, ray_diff, mask


def ref_plucker(ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> jnp.ndarray:
  """Plücker coordinates of target rays (reference render_ray.py:372-377)."""
  d = ray_d / jnp.maximum(
      jnp.linalg.norm(ray_d, axis=-1, keepdims=True), 1e-12)
  moment = jnp.cross(ray_o, d)
  return jnp.concatenate([d, moment], axis=-1)                   # [R, 6]


def src_plucker(pts: jnp.ndarray, src_cameras: jnp.ndarray) -> jnp.ndarray:
  """Plücker coordinates of source->point rays (render_ray.py:380-396).

  pts: [R, S, 3]; returns [R, S, V, 6].
  """
  _, _, _, c2w = cam.split_camera(src_cameras)
  origins = c2w[:, :3, 3]                                        # [V,3]
  ray = pts[None] - origins[:, None, None, :]                    # [V,R,S,3]
  ray = ray / jnp.maximum(
      jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)
  o = jnp.broadcast_to(origins[:, None, None, :], ray.shape)
  moment = jnp.cross(o, ray)
  out = jnp.concatenate([ray, moment], axis=-1)                  # [V,R,S,6]
  return jnp.transpose(out, (1, 2, 0, 3))


def src_plucker_cm(pts: jnp.ndarray, src_cameras: jnp.ndarray) -> jnp.ndarray:
  """Channel-major twin of :func:`src_plucker`: [V, 6, R*S] for the fused
  aggregators' feature-major tiles (compute_with_motions_cm handoff)."""
  _, _, _, c2w = cam.split_camera(src_cameras)
  origins = c2w[:, :3, 3]                                        # [V,3]
  ray = pts[None] - origins[:, None, None, :]                    # [V,R,S,3]
  ray = ray / jnp.maximum(
      jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)
  o = jnp.broadcast_to(origins[:, None, None, :], ray.shape)
  moment = jnp.cross(o, ray)
  out = jnp.concatenate([ray, moment], axis=-1)                  # [V,R,S,6]
  v, r, s, _ = out.shape
  return jnp.transpose(out, (0, 3, 1, 2)).reshape(v, 6, r * s)
