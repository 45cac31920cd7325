"""Gatherless bilinear sampling: a Pallas TPU kernel.

The render step's bottleneck is the bilinear featmap lookup over
[views x rays x samples] points (DESIGN.md section 2; reference
ibrnet/projection.py:148-161).  XLA's per-point gather is
descriptor-bound (~16 ns/point on v5e regardless of item size), and
gathers of large strips are pathological (measured 17 s for 45k
[16,64,C] slices); the XLA epipolar-strip variant (ops/strip_sample.py)
additionally round-trips multi-GB one-hot intermediates through HBM.

This kernel never gathers, keeps every intermediate in VMEM, and runs
the whole dataflow *point-major on lanes* so no operand ever needs a
relayout or a padded minor dimension:

  * the feature map is re-laid-out once per frame to [Wf, Hp*Cp] with x
    on sublanes and _BLK-row blocks of channel-major lanes
    (lane = blk*_BLK*Cp + ch*_BLK + y_rel); the WHOLE view stays VMEM-
    resident across its grid steps (~0.8 MB at production shapes);
  * per ray-group, the two 16-row blocks around the group's epipolar
    y-window are plain `pl.ds` lane slices (aligned: _BLK*Cp is a
    128-multiple); the window index rides a per-point lane of an int
    input, read once as a scalar (SMEM block specs and scalar-prefetch
    index maps both measured badly here);
  * x-interpolation on the MXU: slab [Wf, _BLK*Cp] contracted over Wf
    against a folded transposed one-hot [Wf, N] -> col [_BLK*Cp, N];
  * y-interpolation: transposed per-block one-hots [_BLK, N] tiled along
    sublanes (pltpu.repeat tiles whole copies, matching the channel-
    major slab layout), one multiply-add, then a static summing matmul
    [C, _BLK*Cp] @ [.., N] that folds y and extracts channels in one
    MXU pass -- no dynamic lane addressing, which Mosaic cannot do
    across vregs;
  * per-point fields are packed on an 8-sublane axis with points on
    full lanes ([V, n_grp, 8, N] f32 -- a [V, N, 8] minor-dim layout
    measured ~16x write amplification from HBM tile padding) and the
    output is written channel-major [V, C, N], transposed once outside.

Exactness: identical to grid_sample(align_corners=True,
padding_mode='zeros') for `covered` samples -- those whose in-image
y-corners fall inside the group's 32-row window (guaranteed whenever the
group's corner span is < 17 rows; eval rays are scanline-ordered so
adjacent rays' epipolar segments nearly coincide).  Uncovered samples
must be masked out by the caller, exactly like ops/strip_sample.py.
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

_BLK = 16          # default y rows per window block; window = 2 blocks


def _sample_kernel(pk_ref, fm_ref, msum_ref, out_ref,
                   *, wf: int, cp: int, blk: int, acc_dtype,
                   interpret: bool):
  n = pk_ref.shape[-1]
  span = blk * cp
  # packed fields on the 8-sublane axis (full tiles; see module doc)
  cx = pk_ref[0, 0, 0:1, :].astype(jnp.int32)             # [1, N]
  cy = pk_ref[0, 0, 1:2, :].astype(jnp.int32)
  k = pk_ref[0, 0, 2, 0].astype(jnp.int32)                # scalar
  slab_lo = fm_ref[0, :, pl.ds(k * span, span)]           # [Wf, BLK*Cp]
  slab_hi = fm_ref[0, :, pl.ds((k + 1) * span, span)]

  # f32 maps need explicit HIGHEST: this backend silently runs f32
  # matmuls as single bf16 passes otherwise (DESIGN.md section 4).
  # Interpret mode runs on the host backend, whose dot thunk cannot mix
  # bf16 operands with an f32 accumulator -- upcast there.
  def dotT(a, b, contract):
    if interpret:
      a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    return lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=(lax.Precision.HIGHEST if acc_dtype == jnp.float32
                   else lax.Precision.DEFAULT))

  # folded transposed x one-hot [Wf, N]: weight + in-image validity baked
  # into the weights; an out-of-range corner matches no row == zero
  wxa = pk_ref[0, 0, 3:4, :].astype(fm_ref.dtype)
  wxb = pk_ref[0, 0, 4:5, :].astype(fm_ref.dtype)
  xiota = lax.broadcasted_iota(jnp.int32, (wf, n), 0)
  xoneh = (wxa * (cx == xiota)
           + wxb * (cx + 1 == xiota)).astype(fm_ref.dtype)

  # contract over Wf: [Wf, span] x [Wf, N] -> [span, N]
  col_lo = dotT(slab_lo, xoneh, (((0,), (0,)))).astype(acc_dtype)
  col_hi = dotT(slab_hi, xoneh, (((0,), (0,)))).astype(acc_dtype)

  # transposed y one-hots [_BLK, N] relative to the window start; corners
  # land either in the low or the high block.  pltpu.repeat tiles whole
  # copies along sublanes, matching the channel-major slab layout
  # (sublane = ch*BLK + y_rel after the dot).
  wya = pk_ref[0, 0, 5:6, :].astype(acc_dtype)
  wyb = pk_ref[0, 0, 6:7, :].astype(acc_dtype)
  yiota = lax.broadcasted_iota(jnp.int32, (blk, n), 0)
  y_lo = (wya * (cy == yiota) + wyb * (cy + 1 == yiota)).astype(acc_dtype)
  y_hi = (wya * (cy - blk == yiota)
          + wyb * (cy + 1 - blk == yiota)).astype(acc_dtype)

  p = (col_lo * pltpu.repeat(y_lo, cp, axis=0)
       + col_hi * pltpu.repeat(y_hi, cp, axis=0))         # [span, N]
  # fold y + extract channels in one static matmul: [C, span] x [span, N]
  out = dotT(msum_ref[:, :], p.astype(msum_ref.dtype), ((1,), (0,)))
  out_ref[0] = out.astype(out_ref.dtype)                  # [C, N]


def _prep_featmap(fm: jnp.ndarray, blk: int) -> jnp.ndarray:
  """[V, H, W, C] -> [V, W, Hp*Cp]: blk-row blocks, channel-major lanes.

  H is zero-padded to >= 2 blocks of blk rows and C to Cp = 8-multiples
  so every block's lane extent (blk*Cp) is a 128-multiple (Mosaic)."""
  v, h, w, c = fm.shape
  hp = max(2, -(-h // blk)) * blk
  cp = -(-c // 8) * 8
  fm = jnp.pad(fm, ((0, 0), (0, hp - h), (0, 0), (0, cp - c)))
  fm = jnp.transpose(fm, (0, 2, 1, 3))                    # [V, W, Hp, Cp]
  fm = fm.reshape(v, w, hp // blk, blk, cp)
  fm = jnp.transpose(fm, (0, 1, 2, 4, 3))                 # [..., Cp, blk]
  return fm.reshape(v, w, hp * cp)


def window_prep(grid: jnp.ndarray, h: int, w: int, dtype,
                group: int = 0, blk: int = 0) -> dict:
  """Per-point packed fields + the window-coverage predicate.

  Factored out of the kernel launcher so coverage of a candidate
  (group, blk) pairing can be measured without running the kernel — the
  `covered` it returns is exactly the mask the sampler hands back.
  """
  v, r = grid.shape[0], grid.shape[1]
  s = grid.shape[2]
  if blk <= 0:
    blk = _BLK if h <= 128 else 2 * _BLK
  n_target = 1024 if dtype == jnp.float32 else 2048
  if group <= 0:
    group = max(8, (n_target // s) // 8 * 8)  # 8-multiple: n stays aligned
  r_pad = (-r) % group
  if r_pad:
    # pad rays far out of the image: non-contributing, so they neither
    # pollute the group's y-window min nor produce nonzero output
    grid = jnp.pad(grid, ((0, 0), (0, r_pad), (0, 0), (0, 0)),
                   constant_values=-3.0)
  rp = r + r_pad
  n_grp = rp // group
  n = group * s
  n_blk = max(2, -(-h // blk))

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

  # per-group y window: two blk-row blocks starting at the lowest
  # contributing corner's block (clamped so the high block exists)
  contrib = (vx0 | vx1) & (vy0 | vy1)
  y0c = jnp.clip(y0, 0, max(h - 2, 0)).astype(jnp.int32)
  ymin = jnp.min(jnp.where(contrib, y0c, h).reshape(v, n_grp, n), axis=-1)
  kblk = jnp.clip(ymin // blk, 0, n_blk - 2)               # [V, n_grp]
  win_lo = kblk * blk
  wl = jnp.repeat(win_lo, n, axis=1).reshape(v, rp, s)
  y0i = y0.astype(jnp.int32)
  covered = ~contrib | (
      (~vy0 | ((y0i >= wl) & (y0i < wl + 2 * blk)))
      & (~vy1 | ((y0i + 1 >= wl) & (y0i + 1 < wl + 2 * blk))))

  # per-point fields packed on an 8-sublane axis, points on full lanes:
  # [V, n_grp, 8, N] f32 tiles perfectly (a minor-dim-8 layout measured
  # ~16x HBM write amplification; thin [*, N] blocks violate Mosaic's
  # block rules).  f32 holds the small ints exactly.
  def gp(a):
    return a.astype(jnp.float32).reshape(v, n_grp, n)
  pk = jnp.stack([gp(x0), gp(y0 - wl), gp(wl // blk), gp(wxa), gp(wxb),
                  gp(wya), gp(wyb), gp(jnp.zeros_like(wxa))], axis=2)
  return {"blk": blk, "group": group, "grid": grid, "covered": covered,
          "r": r, "rp": rp, "n_grp": n_grp, "n": n, "n_blk": n_blk,
          "pk": pk}


def pallas_bilinear_sample_views(
    featmaps: jnp.ndarray, grid: jnp.ndarray, group: int = 0,
    blk: int = 0, interpret: bool = False, layout: str = "rsvc"
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Sample featmaps [V,H,W,C] at grid [V,R,S,2] (normalized, (x,y)).

  Rays are grouped `group` at a time (consecutive rays share a y-window;
  eval rays are scanline-ordered so adjacent rays' epipolar segments are
  nearly identical).  group=0 auto-sizes ~2048 points per kernel step
  (1024 for f32 -- VMEM).  blk=0 scales the y-window block with the map
  height (16 rows for <=1/4-res feature maps, 32 for full-res images) so
  coverage stays comparable across resolutions; blk*ceil(C/8)*8 must be
  a 128-multiple.

  layout="rsvc" (default): returns (vals [V,R,S,C], covered [V,R,S]).
  layout="cm": returns the kernel's NATIVE channel-major output
  ([V, C, R*S], point index = ray*S + sample) without the transpose —
  the layout-stable handoff into the fused aggregators (their feature-
  major [C, N] tiles use the identical point ordering), eliminating the
  [R,S,V,C] round-trip between the two kernels.
  """
  v, h, w, c = featmaps.shape
  s = grid.shape[2]
  prep = window_prep(grid, h, w, featmaps.dtype, group=group, blk=blk)
  blk, group = prep["blk"], prep["group"]
  grid, covered = prep["grid"], prep["covered"]
  r, rp, n_grp, n = prep["r"], prep["rp"], prep["n_grp"], prep["n"]
  n_blk, pk = prep["n_blk"], prep["pk"]

  fmt = _prep_featmap(featmaps, blk)
  cp = -(-c // 8) * 8
  acc_dtype = (jnp.float32 if featmaps.dtype == jnp.float32
               else jnp.bfloat16)
  # static y-fold + channel-extraction matrix: msum[ch, ch*BLK + y] = 1
  msum = jnp.asarray(
      np.kron(np.eye(cp, dtype=np.float32)[:c, :],
              np.ones((1, blk), np.float32)),
      dtype=featmaps.dtype)                                # [C, blk*Cp]

  kernel = functools.partial(_sample_kernel, wf=w, cp=cp, blk=blk,
                             acc_dtype=acc_dtype, interpret=interpret)
  grid_spec = pl.GridSpec(
      grid=(v, n_grp),
      in_specs=[
          pl.BlockSpec((1, 1, 8, n), lambda i, g: (i, g, 0, 0),
                       memory_space=pltpu.VMEM),           # packed fields
          pl.BlockSpec((1, w, n_blk * blk * cp),
                       lambda i, g: (i, 0, 0),
                       memory_space=pltpu.VMEM),           # whole-view fm
          pl.BlockSpec((c, blk * cp), lambda i, g: (0, 0),
                       memory_space=pltpu.VMEM),           # msum
      ],
      out_specs=pl.BlockSpec((1, c, n), lambda i, g: (i, 0, g),
                             memory_space=pltpu.VMEM),
  )

  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((v, c, rp * s), featmaps.dtype),
      interpret=interpret,
  )(pk, fmt, msum)

  if layout == "cm":
    # contiguous prefix slice (cheap) drops the ray padding
    return out[:, :, :r * s], covered[:, :r]
  vals = jnp.transpose(out, (0, 2, 1)).reshape(v, rp, s, c)[:, :r]
  return vals, covered[:, :r]


# --------------------------------------------------------------------------
# NOTE: a differentiable wrapper (`pallas_bilinear_sample_views_diff`,
# Pallas primal + gather-VJP backward) lived here until round 4, backing
# the removed `strip_train` mode.  It was deleted after the convergence
# post-mortem (DESIGN.md §3): masking uncovered samples out of the
# aggregation silently censors exactly the samples carrying the largest
# motion-field restoring gradients, and the motion field diverges.
# Training always uses ops/grid_sample.py's exact gather + custom VJP.
