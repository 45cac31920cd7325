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

import functools

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


def _corner_terms(img_shape, grid):
  """Shared geometry: starts, per-cell weights, corner weights/validity."""
  h, w, _ = img_shape
  x = (grid[:, 0] + 1.0) * 0.5 * (w - 1)
  y = (grid[:, 1] + 1.0) * 0.5 * (h - 1)
  x0 = jnp.floor(x)
  y0 = jnp.floor(y)
  wx1 = x - x0
  wy1 = y - y0
  sx = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
  sy = jnp.clip(y0, 0, h - 2).astype(jnp.int32)

  corners = []
  for dx, dy, wgt in (
      (0, 0, (1 - wx1) * (1 - wy1)), (1, 0, wx1 * (1 - wy1)),
      (0, 1, (1 - wx1) * wy1), (1, 1, wx1 * wy1)):
    xc = x0 + dx
    yc = y0 + dy
    valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
             ).astype(grid.dtype)
    ox = jnp.clip(xc.astype(jnp.int32) - sx, 0, 1)
    oy = jnp.clip(yc.astype(jnp.int32) - sy, 0, 1)
    corners.append((wgt, valid, ox, oy))
  return x0, y0, wx1, wy1, sx, sy, corners


def _cell_weights(corners, dtype):
  """4 corner weights -> 4 patch-cell weights [(w00, w01, w10, w11)]."""
  cells = [0.0, 0.0, 0.0, 0.0]
  for wgt, valid, ox, oy in corners:
    wv = (wgt * valid).astype(dtype)
    oxf = ox.astype(dtype)
    oyf = oy.astype(dtype)
    cells[0] = cells[0] + wv * (1 - oyf) * (1 - oxf)
    cells[1] = cells[1] + wv * (1 - oyf) * oxf
    cells[2] = cells[2] + wv * oyf * (1 - oxf)
    cells[3] = cells[3] + wv * oyf * oxf
  return cells


def _gather_patches(img, sy, sx):
  starts = jnp.stack([sy, sx], axis=-1)
  dnums = lax.GatherDimensionNumbers(
      offset_dims=(1, 2, 3), collapsed_slice_dims=(),
      start_index_map=(0, 1))
  return lax.gather(img, starts, dnums, slice_sizes=(2, 2, img.shape[-1]),
                    mode=lax.GatherScatterMode.CLIP)       # [N, 2, 2, C]


def _scatter_as_matmul(contrib: jnp.ndarray, flat_idx: jnp.ndarray,
                       hw: int, tile: int = 4096) -> jnp.ndarray:
  """Σ_n onehot(idx_n) ⊗ contrib_n as tiled one-hot matmuls.

  This is the featmap gradient of the sampler.  XLA's native scatter-add for
  this pattern is catastrophically slow on TPU (97% of a training step);
  9216-position feature maps make the dense one-hot matmul the fast path —
  MXU FLOPs instead of serialized scatters.
  """
  n, c = contrib.shape
  n_pad = (-n) % tile
  contrib = jnp.pad(contrib, ((0, n_pad), (0, 0)))
  # padded rows carry zero contribution; index value is irrelevant
  flat_idx = jnp.pad(flat_idx, (0, n_pad))
  contrib_t = contrib.reshape(-1, tile, c)
  idx_t = flat_idx.reshape(-1, tile)
  iota = jnp.arange(hw, dtype=flat_idx.dtype)

  def body(acc, args):
    c_t, i_t = args
    onehot = (i_t[:, None] == iota[None, :]).astype(contrib.dtype)
    acc = acc + jnp.einsum("th,tc->hc", onehot, c_t,
                           preferred_element_type=jnp.float32)
    return acc, None

  acc, _ = lax.scan(body, jnp.zeros((hw, c), jnp.float32),
                    (contrib_t, idx_t))
  return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bilinear_sample_diff(img, grid, image_grad: bool):
  return bilinear_sample(img, grid)


def _bsd_fwd(img, grid, image_grad):
  return bilinear_sample(img, grid), (img, grid)


def _bsd_bwd(image_grad, res, cot):
  """cot [N, C] -> (d_img [H,W,C], d_grid [N,2]).

  d_grid is the standard bilinear spatial derivative (floor treated as
  locally constant, exactly like torch grid_sample's backward); d_img is the
  one-hot-matmul scatter above, skipped entirely when image_grad=False
  (source *images* are data; only *feature maps* carry parameter gradients).
  """
  img, grid = res
  h, w, c = img.shape
  x0, y0, wx1, wy1, sx, sy, corners = _corner_terms(img.shape, grid)
  patches = _gather_patches(img, sy, sx).astype(cot.dtype)  # [N,2,2,C]

  # d_cell[ab] = <cot, patch[ab]>
  d_cell = [jnp.sum(cot * patches[:, a, b, :], axis=-1)
            for a, b in ((0, 0), (0, 1), (1, 0), (1, 1))]

  # route each corner's weight-gradient from its cell
  dwx1 = jnp.zeros_like(wx1)
  dwy1 = jnp.zeros_like(wy1)
  dwk_dx = (-(1 - wy1), (1 - wy1), -wy1, wy1)
  dwk_dy = (-(1 - wx1), -wx1, (1 - wx1), wx1)
  for k, (wgt, valid, ox, oy) in enumerate(corners):
    oxf = ox.astype(cot.dtype)
    oyf = oy.astype(cot.dtype)
    d_wk = ((1 - oyf) * (1 - oxf) * d_cell[0]
            + (1 - oyf) * oxf * d_cell[1]
            + oyf * (1 - oxf) * d_cell[2]
            + oyf * oxf * d_cell[3]) * valid
    dwx1 = dwx1 + d_wk * dwk_dx[k]
    dwy1 = dwy1 + d_wk * dwk_dy[k]
  d_grid = jnp.stack([dwx1 * 0.5 * (w - 1), dwy1 * 0.5 * (h - 1)],
                     axis=-1).astype(grid.dtype)

  if image_grad:
    # fold the 4 patch cells into the channel axis: ONE one-hot row per
    # point (vs 4 in the per-corner formulation) against a 4C-wide
    # contribution.  Same MXU FLOPs, but 4x fewer one-hot compare ops /
    # scan rows, and 4C=140 fills the 128-lane matmul tile that C=35
    # left 73% empty.  The (hw, 4C) accumulator lands each cell's mass at
    # its PATCH START; the true pixel is (sy+a, sx+b), restored by the
    # zero-padded shifts below.
    cells = _cell_weights(corners, cot.dtype)
    contrib = jnp.concatenate([cot * cells[k][:, None] for k in range(4)],
                              axis=-1)                      # [N, 4C]
    acc = _scatter_as_matmul(contrib, sy * w + sx, h * w)
    acc = acc.reshape(h, w, 4, c)
    d_img = (acc[:, :, 0]
             + jnp.pad(acc[:, :, 1], ((0, 0), (1, 0), (0, 0)))[:, :w]
             + jnp.pad(acc[:, :, 2], ((1, 0), (0, 0), (0, 0)))[:h]
             + jnp.pad(acc[:, :, 3], ((1, 0), (1, 0), (0, 0)))[:h, :w])
    d_img = d_img.astype(img.dtype)
  else:
    d_img = jnp.zeros_like(img)
  return d_img, d_grid


_bilinear_sample_diff.defvjp(_bsd_fwd, _bsd_bwd)


def bilinear_sample_views(imgs: jnp.ndarray, grids: jnp.ndarray,
                          image_grad: bool = True) -> jnp.ndarray:
  """Per-view batched sampling: imgs [V,H,W,C], grids [V,N,2] -> [V,N,C].

  image_grad=False skips the (expensive) image-gradient scatter in the
  backward pass — use for source *images*; feature maps keep the default.
  """
  return jax.vmap(lambda i, g: _bilinear_sample_diff(i, g, image_grad))(
      imgs, grids)
