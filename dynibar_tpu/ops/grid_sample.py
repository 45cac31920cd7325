"""Bilinear image sampling (torch ``F.grid_sample`` semantics on TPU).

This is the single most performance-critical primitive of the system
(reference: ibrnet/projection.py:148-161 — the per-sample RGB + feature
lookups over [views × rays × samples] points).  TPUs have no texture units
and XLA has no grid_sample; we implement it as four gathers with per-corner
zero-padding weights, matching
``F.grid_sample(..., align_corners=True, padding_mode='zeros')`` bitwise for
in-range points and in the zero-contribution convention for out-of-range
corners.

Layout choice: channels-last [H, W, C] with a flattened [H*W, C] take along
axis 0.  XLA lowers this to a dynamic-gather that keeps the C axis (lane
dimension) contiguous — the right layout for VMEM tiles.  A fused Pallas
gather (coords→DMA) is the planned upgrade; the interface is stable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
  """Sample one image at normalized coords.

  Args:
    img:  [H, W, C]
    grid: [N, 2] normalized coords in [-1, 1], (x, y) order,
          align_corners=True convention (-1 -> 0, +1 -> size-1).

  Returns:
    [N, C] sampled values; out-of-range corners contribute zero.
  """
  h, w, c = img.shape
  x = (grid[:, 0] + 1.0) * 0.5 * (w - 1)
  y = (grid[:, 1] + 1.0) * 0.5 * (h - 1)

  x0 = jnp.floor(x)
  y0 = jnp.floor(y)
  x1 = x0 + 1.0
  y1 = y0 + 1.0

  wx1 = x - x0
  wy1 = y - y0
  wx0 = 1.0 - wx1
  wy0 = 1.0 - wy1

  def corner(xc, yc, wgt):
    valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
    xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
    flat_idx = yi * w + xi
    vals = jnp.take(img.reshape(h * w, c), flat_idx, axis=0)     # [N, C]
    return vals * (wgt * valid.astype(img.dtype))[:, None]

  out = (corner(x0, y0, wx0 * wy0) + corner(x1, y0, wx1 * wy0)
         + corner(x0, y1, wx0 * wy1) + corner(x1, y1, wx1 * wy1))
  return out


def bilinear_sample_views(imgs: jnp.ndarray, grids: jnp.ndarray
                          ) -> jnp.ndarray:
  """Per-view batched sampling: imgs [V,H,W,C], grids [V,N,2] -> [V,N,C]."""
  return jax.vmap(bilinear_sample)(imgs, grids)
