"""Epipolar-strip feature sampling: descriptor-free bilinear lookups.

The per-sample 2x2xC patch gather in :mod:`ops.grid_sample` is
*descriptor-rate bound* on TPU (~33M gather items/s measured on v5e,
independent of item size) -- it issues one descriptor per sample point,
[views x rays x samples] of them, and dominates the render step (DESIGN.md
section 2; reference hot loop ibrnet/projection.py:148-161).

This module restructures the lookup around the epipolar geometry: for a
fixed (ray, view) pair, all S samples along the ray project onto one
epipolar segment in the source view.  Instead of S descriptors we issue

  * ONE strip gather per (ray, view): a [rows, cols, C] window positioned
    at the segment's bounding corner -- S-fold fewer descriptors, and each
    strip row is a fully contiguous run of cols*C elements; then
  * in-strip bilinear interpolation as a folded one-hot matmul
    ([S, rows*cols] weights x [rows*cols, C] strip) -- MXU FLOPs instead of
    serialized gather descriptors, the same trade that made the training
    backward 24x faster (ops/grid_sample._scatter_as_matmul).

Exactness: the one-hot is built from *unclamped* corner positions, so a
corner outside the strip (or outside the image) matches no one-hot column
and contributes exactly zero -- which coincides with
``grid_sample(align_corners=True, padding_mode='zeros')`` semantics for
out-of-image corners.  A sample is ``covered`` when every *in-image* corner
falls inside its ray's strip; covered samples are bit-for-bit-in-math equal
to :func:`ops.grid_sample.bilinear_sample` (up to matmul accumulation
order).  Uncovered samples (segment larger than the strip) return partial
sums; callers must AND ``covered`` into the sample validity mask, which the
IBR aggregation already multiplies in -- the same mechanism that excludes
out-of-frustum samples in the reference (projection.py:13-20).

This is the opt-in fast path (``RenderSettings.strip_sampling``); the exact
per-sample gather remains the default and the parity reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _strip_sample_one(fm: jnp.ndarray, grid: jnp.ndarray, rows: int,
                      cols: int, ray_tile: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Strip-sample one view.

  Args:
    fm:   [H, W, C] feature map.
    grid: [R, S, 2] normalized coords in [-1, 1], (x, y),
          align_corners=True convention.
    rows/cols: strip extent (static).
    ray_tile: rays per interpolation tile (static; bounds live memory).

  Returns:
    vals    [R, S, C] (fm dtype), covered [R, S] bool.
  """
  h, w, c = fm.shape
  r, s, _ = grid.shape

  x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)                    # [R, S]
  y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
  x0 = jnp.floor(x)
  y0 = jnp.floor(y)
  wx1 = (x - x0).astype(jnp.float32)
  wy1 = (y - y0).astype(jnp.float32)

  # validity of each corner in the image (zero-padding semantics); uses the
  # raw (unclamped) corner coordinate like ops.grid_sample.
  vx0 = (x0 >= 0) & (x0 <= w - 1)
  vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
  vy0 = (y0 >= 0) & (y0 <= h - 1)
  vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

  # strip origin per ray: the bounding corner of the ray's *contributing*
  # corner footprint, clamped so the strip stays inside the image.
  # Non-contributing samples (out of frustum / image -- including the
  # projector's +-1e6 sentinels, whose clamped coords would otherwise drag
  # the origin) are excluded from the min; their coverage is vacuous.
  contrib = (vx0 | vx1) & (vy0 | vy1)                         # [R, S]
  x0c = jnp.clip(x0, 0, w - 2).astype(jnp.int32)              # guards cast
  y0c = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
  ox = jnp.clip(jnp.min(jnp.where(contrib, x0c, w), axis=1),
                0, max(w - cols, 0)).astype(jnp.int32)        # [R]
  oy = jnp.clip(jnp.min(jnp.where(contrib, y0c, h), axis=1),
                0, max(h - rows, 0)).astype(jnp.int32)

  # corner positions *relative to the strip*, from the raw coords and
  # unclamped: a miss simply matches no one-hot column, which is exactly
  # the zero contribution grid_sample assigns out-of-image corners.
  # raw (not clamped!) so boundary corners keep their true column: e.g.
  # x in (-1, 0) has the valid +1 corner at column 0 == (x0=-1)+1, while
  # the clamped x0c=0 would shift it to 1.  Invalid corners carry zero
  # weight, so their garbage positions are harmless.
  cx0 = x0.astype(jnp.int32) - ox[:, None]
  cy0 = y0.astype(jnp.int32) - oy[:, None]
  # A corner has nonzero weight iff vx_a & vy_b (& hence contrib); only
  # those must land in-strip.  Samples with no contributing corner at all
  # (out of image / frustum) are vacuously covered -- they were also
  # excluded from the origin min, so their positions can be anything.
  covered = ~contrib | ((~vx0 | (cx0 >= 0))
                        & (~vx1 | (cx0 + 1 <= cols - 1))
                        & (~vy0 | (cy0 >= 0))
                        & (~vy1 | (cy0 + 1 <= rows - 1)))

  wxa = jnp.where(vx0, 1.0 - wx1, 0.0)                        # [R, S] f32
  wxb = jnp.where(vx1, wx1, 0.0)
  wya = jnp.where(vy0, 1.0 - wy1, 0.0)
  wyb = jnp.where(vy1, wy1, 0.0)

  # one strip per ray; rows are contiguous cols*C runs in memory
  starts = jnp.stack([oy, ox], axis=-1)                       # [R, 2]
  dnums = lax.GatherDimensionNumbers(
      offset_dims=(1, 2, 3), collapsed_slice_dims=(),
      start_index_map=(0, 1))
  strips = lax.gather(fm, starts, dnums, slice_sizes=(rows, cols, c),
                      mode=lax.GatherScatterMode.CLIP)        # [R,rows,cols,C]
  strips = strips.reshape(r, rows * cols, c)

  # pad rays to a tile multiple; padded rays are sliced off below
  n_pad = (-r) % ray_tile
  def pad(a):
    return jnp.pad(a, ((0, n_pad),) + ((0, 0),) * (a.ndim - 1))
  strips_t = pad(strips).reshape(-1, ray_tile, rows * cols, c)
  per_ray = [pad(a).reshape(-1, ray_tile, s)
             for a in (cy0, cx0, wya, wyb, wxa, wxb)]

  row_iota = jnp.arange(rows, dtype=jnp.int32)
  col_iota = jnp.arange(cols, dtype=jnp.int32)
  dot_kw = dict(preferred_element_type=jnp.float32)
  if fm.dtype == jnp.float32:
    dot_kw["precision"] = lax.Precision.HIGHEST

  def tile_body(_, args):
    st, (tcy, tcx, twya, twyb, twxa, twxb) = args[0], args[1:]
    # separable folded one-hots: weight + validity baked in, misses match
    # no column (rows: [T,S,rows]; cols: [T,S,cols])
    ay = (twya[..., None] * (tcy[..., None] == row_iota)
          + twyb[..., None] * (tcy[..., None] + 1 == row_iota))
    ax = (twxa[..., None] * (tcx[..., None] == col_iota)
          + twxb[..., None] * (tcx[..., None] + 1 == col_iota))
    w_oh = (ay[..., :, None] * ax[..., None, :]).reshape(
        ay.shape[:2] + (rows * cols,)).astype(fm.dtype)       # [T,S,K]
    vals = jnp.einsum("tsk,tkc->tsc", w_oh, st, **dot_kw)
    return None, vals.astype(fm.dtype)

  _, vals = lax.scan(tile_body, None, (strips_t,) + tuple(per_ray))
  vals = vals.reshape(-1, s, c)[:r]
  return vals, covered


def strip_sample_views(featmaps: jnp.ndarray, grid: jnp.ndarray,
                       rows: int = 16, cols: int = 64, ray_tile: int = 32
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Per-view strip sampling: featmaps [V,H,W,C], grid [V,R,S,2].

  Returns (vals [V,R,S,C], covered [V,R,S]).  Covered samples match
  :func:`ops.grid_sample.bilinear_sample_views` exactly (modulo matmul
  accumulation); uncovered samples MUST be masked out by the caller.
  """
  h, w = featmaps.shape[1:3]
  rows = min(rows, h)
  cols = min(cols, w)
  fn = functools.partial(_strip_sample_one, rows=rows, cols=cols,
                         ray_tile=ray_tile)
  return jax.vmap(fn)(featmaps, grid)
