"""Bilinear image sampling (torch ``F.grid_sample`` semantics on TPU).

This is the single most performance-critical primitive of the system
(reference: ibrnet/projection.py:148-161 — the per-sample RGB + feature
lookups over [views × rays × samples] points); ablation shows it dominates
the render step.  TPUs have no texture units; the implementation gathers one
2×2×C *patch* per point with a single ``lax.gather`` (x-corners are
contiguous in memory, so each slice is 2 rows of 2·C contiguous elements)
and blends corners on the VPU — 4× fewer gather ops than the naive
four-corner formulation.

Semantics match ``F.grid_sample(..., align_corners=True,
padding_mode='zeros')``: in-range points interpolate exactly; out-of-range
corners contribute zero.  Patch starts are clamped to stay in-bounds; the
true corner is then re-selected inside the patch by its (clipped) offset,
which is exact because every *valid* corner lies within the clamped patch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def bilinear_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
  """Sample one image at normalized coords.

  Args:
    img:  [H, W, C]
    grid: [N, 2] normalized coords in [-1, 1], (x, y) order,
          align_corners=True convention (-1 -> 0, +1 -> size-1).

  Returns:
    [N, C] sampled values (img dtype); out-of-range corners contribute zero.
  """
  h, w, c = img.shape
  x = (grid[:, 0] + 1.0) * 0.5 * (w - 1)
  y = (grid[:, 1] + 1.0) * 0.5 * (h - 1)

  x0 = jnp.floor(x)
  y0 = jnp.floor(y)
  wx1 = x - x0
  wy1 = y - y0
  wx0 = 1.0 - wx1
  wy0 = 1.0 - wy1

  # clamped patch starts (also guards the int cast against ±1e6 coords)
  sx = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
  sy = jnp.clip(y0, 0, h - 2).astype(jnp.int32)

  # one [2, 2, C] patch per point
  starts = jnp.stack([sy, sx], axis=-1)                     # [N, 2]
  dnums = lax.GatherDimensionNumbers(
      offset_dims=(1, 2, 3), collapsed_slice_dims=(),
      start_index_map=(0, 1))
  patches = lax.gather(img, starts, dnums, slice_sizes=(2, 2, c),
                       mode=lax.GatherScatterMode.CLIP)     # [N, 2, 2, C]

  # corner -> position inside the (possibly shifted) patch + validity
  def corner(xc, yc, wgt):
    valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1))
    ox = jnp.clip(xc.astype(jnp.int32) - sx, 0, 1).astype(img.dtype)
    oy = jnp.clip(yc.astype(jnp.int32) - sy, 0, 1).astype(img.dtype)
    wgt = (wgt * valid).astype(img.dtype)
    # distribute this corner's weight onto the patch cell it maps to
    return (wgt * (1 - oy) * (1 - ox), wgt * (1 - oy) * ox,
            wgt * oy * (1 - ox), wgt * oy * ox)

  w00 = corner(x0, y0, wx0 * wy0)
  w01 = corner(x0 + 1, y0, wx1 * wy0)
  w10 = corner(x0, y0 + 1, wx0 * wy1)
  w11 = corner(x0 + 1, y0 + 1, wx1 * wy1)
  cell = [sum(ws) for ws in zip(w00, w01, w10, w11)]        # 4 × [N]

  out = (patches[:, 0, 0, :] * cell[0][:, None]
         + patches[:, 0, 1, :] * cell[1][:, None]
         + patches[:, 1, 0, :] * cell[2][:, None]
         + patches[:, 1, 1, :] * cell[3][:, None])
  return out


def bilinear_sample_views(imgs: jnp.ndarray, grids: jnp.ndarray
                          ) -> jnp.ndarray:
  """Per-view batched sampling: imgs [V,H,W,C], grids [V,N,2] -> [V,N,C]."""
  return jax.vmap(bilinear_sample)(imgs, grids)
