"""Gatherless bilinear sampling: a Pallas TPU kernel.

The render step's bottleneck is the bilinear featmap lookup over
[views x rays x samples] points (DESIGN.md section 2; reference
ibrnet/projection.py:148-161).  XLA's per-point gather saturates the
gather unit far below HBM bandwidth, and gathers of large strips are worse
still (measured 17s for 45k [16,64,C] slices on v5e); the XLA
epipolar-strip variant (ops/strip_sample.py) additionally round-trips
multi-GB one-hot intermediates through HBM.

This kernel never gathers and keeps every intermediate in VMEM:

  * the feature map is re-laid-out once per frame to blocks of
    [Wf, _BLK*C] with x on sublanes and channel-major lanes
    (lane = ch*_BLK + y_rel); per ray-group the two 16-row blocks around
    the group's epipolar y-window are selected via scalar prefetch (the
    segments of G adjacent scanline rays share a narrow y-window);
  * x-interpolation runs on the MXU: a folded one-hot
    [G*S, Wf] @ block [Wf, _BLK*C] dot -- exact for the full image width;
  * y-interpolation runs as one tiled expansion (pltpu.repeat), one
    multiply-add, and a static summing matmul [_BLK*C, C] that folds the
    y axis and extracts channels in a single MXU pass -- no dynamic lane
    addressing, which Mosaic cannot do across vregs.

Exactness: identical semantics to grid_sample(align_corners=True,
padding_mode='zeros') for `covered` samples -- those whose in-image
y-corners fall inside the group's 32-row window (guaranteed whenever the
group's corner span is < 17 rows).  Uncovered samples must be masked out
by the caller, exactly like ops/strip_sample.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 16          # y rows per fetched block; window = 2 blocks = 32 rows


def _sample_kernel(yblk_ref, cx0_ref, cy_rel_ref, wxa_ref, wxb_ref,
                   wya_ref, wyb_ref, fm_lo_ref, fm_hi_ref, msum_ref,
                   out_ref, *, wf: int, cp: int, acc_dtype):
  del yblk_ref  # consumed by the index maps only
  n = cx0_ref.shape[1]
  fm_lo = fm_lo_ref[0]                                    # [Wf, BLK*C]
  fm_hi = fm_hi_ref[0]

  # folded x one-hot: weight + in-image validity baked into wxa/wxb; an
  # out-of-range corner matches no column == zero contribution
  cx0 = cx0_ref[0]                                        # [n, 1]
  xiota = lax.broadcasted_iota(jnp.int32, (n, wf), 1)
  xoneh = (wxa_ref[0] * (cx0 == xiota)
           + wxb_ref[0] * (cx0 + 1 == xiota)).astype(fm_lo.dtype)

  # f32 maps need explicit HIGHEST: this backend silently runs f32 matmuls
  # as single bf16 passes otherwise (DESIGN.md section 4)
  dot = functools.partial(
      lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
      precision=(lax.Precision.HIGHEST if acc_dtype == jnp.float32
                 else lax.Precision.DEFAULT))
  col_lo = dot(xoneh, fm_lo).astype(acc_dtype)            # [n, BLK*C]
  col_hi = dot(xoneh, fm_hi).astype(acc_dtype)

  # y one-hots relative to the window start; corners land either in the
  # low or the high block.  pltpu.repeat tiles whole copies, matching the
  # channel-major block layout (lane = ch*BLK + y_rel).
  cy = cy_rel_ref[0]                                      # [n, 1]
  yiota = lax.broadcasted_iota(jnp.int32, (n, _BLK), 1)
  wya = wya_ref[0]
  wyb = wyb_ref[0]
  y_lo = (wya * (cy == yiota) + wyb * (cy + 1 == yiota)).astype(acc_dtype)
  y_hi = (wya * (cy - _BLK == yiota)
          + wyb * (cy + 1 - _BLK == yiota)).astype(acc_dtype)

  p = (col_lo * pltpu.repeat(y_lo, cp, axis=1)
       + col_hi * pltpu.repeat(y_hi, cp, axis=1))         # [n, BLK*Cp]
  # fold y and extract channels in one static matmul
  out = dot(p.astype(msum_ref.dtype), msum_ref[:, :])     # [n, C]
  out_ref[0] = out.astype(out_ref.dtype)


def _prep_featmap(fm: jnp.ndarray) -> jnp.ndarray:
  """[V, H, W, C] -> [V, W, Hp*Cp]: _BLK-row blocks, channel-major lanes.

  H is zero-padded to _BLK multiples and C to Cp = 8-multiples so every
  block's lane extent (_BLK*Cp) is a 128-multiple (Mosaic block rule)."""
  v, h, w, c = fm.shape
  hp = -(-h // _BLK) * _BLK
  cp = -(-c // 8) * 8
  fm = jnp.pad(fm, ((0, 0), (0, hp - h), (0, 0), (0, cp - c)))
  fm = jnp.transpose(fm, (0, 2, 1, 3))                    # [V, W, Hp, Cp]
  fm = fm.reshape(v, w, hp // _BLK, _BLK, cp)
  fm = jnp.transpose(fm, (0, 1, 2, 4, 3))                 # [..., Cp, BLK]
  return fm.reshape(v, w, hp * cp)


def pallas_bilinear_sample_views(
    featmaps: jnp.ndarray, grid: jnp.ndarray, group: int = 0,
    interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Sample featmaps [V,H,W,C] at grid [V,R,S,2] (normalized, (x,y)).

  Rays are grouped `group` at a time (consecutive rays share a y-window;
  eval rays are scanline-ordered so adjacent rays' epipolar segments are
  nearly identical).  group=0 picks ~1024 points per kernel step.

  Returns (vals [V,R,S,C] in featmap dtype, covered [V,R,S] bool).
  """
  v, h, w, c = featmaps.shape
  _, r, s, _ = grid.shape
  if group <= 0:
    group = max(8, (1024 // s) // 8 * 8)  # 8-multiple keeps n 8-aligned
  r_pad = (-r) % group
  if r_pad:
    # pad rays far out of the image: non-contributing, so they neither
    # pollute the group's y-window min nor produce nonzero output
    grid = jnp.pad(grid, ((0, 0), (0, r_pad), (0, 0), (0, 0)),
                   constant_values=-3.0)
  rp = r + r_pad
  n_grp = rp // group
  n = group * s
  n_blk = -(-h // _BLK)

  x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)                 # [V,RP,S]
  y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
  x0 = jnp.floor(x)
  y0 = jnp.floor(y)
  wx1 = (x - x0).astype(jnp.float32)
  wy1 = (y - y0).astype(jnp.float32)
  vx0 = (x0 >= 0) & (x0 <= w - 1)
  vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
  vy0 = (y0 >= 0) & (y0 <= h - 1)
  vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
  wxa = jnp.where(vx0, 1.0 - wx1, 0.0)
  wxb = jnp.where(vx1, wx1, 0.0)
  wya = jnp.where(vy0, 1.0 - wy1, 0.0)
  wyb = jnp.where(vy1, wy1, 0.0)

  # per-group y window: two _BLK-row blocks starting at the lowest
  # contributing corner's block
  contrib = (vx0 | vx1) & (vy0 | vy1)
  y0c = jnp.clip(y0, 0, max(h - 2, 0)).astype(jnp.int32)
  ymin = jnp.min(jnp.where(contrib, y0c, h).reshape(v, n_grp, n), axis=-1)
  kblk = jnp.clip(ymin // _BLK, 0, n_blk - 1)              # [V, n_grp]
  win_lo = kblk * _BLK
  win_hi = jnp.minimum(win_lo + 2 * _BLK, n_blk * _BLK)    # exclusive
  wl = jnp.repeat(win_lo, n, axis=1).reshape(v, rp, s)
  wh = jnp.repeat(win_hi, n, axis=1).reshape(v, rp, s)
  y0i = y0.astype(jnp.int32)
  covered = ~contrib | (
      (~vy0 | ((y0i >= wl) & (y0i < wh)))
      & (~vy1 | ((y0i + 1 >= wl) & (y0i + 1 < wh))))

  def col3(a, dtype):
    return a.astype(dtype).reshape(v, rp * s, 1)
  cx0 = col3(x0, jnp.int32)
  cy_rel = col3(y0i - wl, jnp.int32)
  fmt = _prep_featmap(featmaps)

  # both (clamped) y-block indices go through scalar prefetch so the fm
  # index maps are trivial lookups; n_grp goes last — SMEM pads the minor
  # dimension to 128 lanes, so a trailing size-2 axis would blow the
  # 1 MB SMEM budget 64x
  kidx2 = jnp.minimum(kblk + 1, n_blk - 1)
  yblk = jnp.stack([kblk, kidx2], axis=1).astype(jnp.int32)  # [V,2,n_grp]

  acc_dtype = (jnp.float32 if featmaps.dtype == jnp.float32
               else jnp.bfloat16)
  # static y-fold + channel-extraction matrix: msum[ch*BLK + y, ch] = 1
  cp = -(-c // 8) * 8
  msum = jnp.asarray(
      np.kron(np.eye(cp, dtype=np.float32)[:, :c],
              np.ones((_BLK, 1), np.float32)),
      dtype=featmaps.dtype)                                # [BLK*Cp, C]

  kernel = functools.partial(_sample_kernel, wf=w, cp=cp,
                             acc_dtype=acc_dtype)

  point_spec = pl.BlockSpec((1, n, 1), lambda i, g, yblk: (i, g, 0),
                            memory_space=pltpu.VMEM)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(v, n_grp),
      in_specs=[
          point_spec,                                      # cx0
          point_spec,                                      # cy_rel
          point_spec,                                      # wxa
          point_spec,                                      # wxb
          point_spec,                                      # wya
          point_spec,                                      # wyb
          pl.BlockSpec((1, w, _BLK * cp),
                       lambda i, g, yblk: (i, 0, yblk[i, 0, g]),
                       memory_space=pltpu.VMEM),           # fm low block
          pl.BlockSpec((1, w, _BLK * cp),
                       lambda i, g, yblk: (i, 0, yblk[i, 1, g]),
                       memory_space=pltpu.VMEM),           # fm high block
          pl.BlockSpec((_BLK * cp, c), lambda i, g, yblk: (0, 0),
                       memory_space=pltpu.VMEM),           # msum
      ],
      out_specs=pl.BlockSpec((1, n, c), lambda i, g, yblk: (i, g, 0),
                             memory_space=pltpu.VMEM),
  )

  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((v, rp * s, c), featmaps.dtype),
      interpret=interpret,
  )(yblk, cx0, cy_rel, col3(wxa, featmaps.dtype), col3(wxb, featmaps.dtype),
    col3(wya, acc_dtype), col3(wyb, acc_dtype), fmt, fmt, msum)

  vals = out.reshape(v, rp, s, c)[:, :r]
  return vals, covered[:, :r]
