"""Softmax forward splatting (point-cloud warp to a virtual view).

Replaces the external CUDA ``splatting.splatting_function('softmax', ...)``
dependency of the reference preprocessing (render_source_vv.py:12,58-60)
with a JAX scatter-add formulation: every source pixel lands bilinearly on
4 target pixels, importance-weighted by exp(alpha·importance); the result is
the importance-softmax-weighted average of contributing colors.

Math (identical to the CUDA op):
  num[q]  = Σ_p  w_bilinear(p→q) · exp(imp_p) · val_p
  den[q]  = Σ_p  w_bilinear(p→q) · exp(imp_p)
  out[q]  = num[q] / den[q]          (0 where den == 0)

Offline/preprocessing workload, so clarity > peak perf; still one fused jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_splat(values: jnp.ndarray, flow: jnp.ndarray,
                  importance: jnp.ndarray) -> jnp.ndarray:
  """Splat `values` along `flow` with softmax importance weighting.

  Args:
    values:     [H, W, C] source pixel payload (rgb, alpha, ...).
    flow:       [H, W, 2] target = (x + flow_x, y + flow_y).
    importance: [H, W] log-importance (e.g. scaled inverse depth).

  Returns:
    [H, W, C] splatted image.
  """
  h, w, c = values.shape
  yy, xx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                        jnp.arange(w, dtype=flow.dtype), indexing="ij")
  tx = (xx + flow[..., 0]).reshape(-1)
  ty = (yy + flow[..., 1]).reshape(-1)

  # numerical stabilization of exp(importance)
  imp = jnp.exp(importance - jnp.max(importance)).reshape(-1)
  vals = values.reshape(-1, c)

  x0 = jnp.floor(tx)
  y0 = jnp.floor(ty)
  num = jnp.zeros((h * w, c), values.dtype)
  den = jnp.zeros((h * w,), values.dtype)

  for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
    xc = x0 + dx
    yc = y0 + dy
    wgt = (1.0 - jnp.abs(tx - xc)) * (1.0 - jnp.abs(ty - yc))
    valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
    wgt = wgt * valid.astype(values.dtype) * imp
    idx = (jnp.clip(yc, 0, h - 1).astype(jnp.int32) * w
           + jnp.clip(xc, 0, w - 1).astype(jnp.int32))
    num = num.at[idx].add(wgt[:, None] * vals)
    den = den.at[idx].add(wgt)

  out = jnp.where(den[:, None] > 0, num / jnp.maximum(den[:, None], 1e-12),
                  0.0)
  return out.reshape(h, w, c)


softmax_splat_jit = jax.jit(softmax_splat)
