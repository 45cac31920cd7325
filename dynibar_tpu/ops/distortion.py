"""mip-NeRF-360 distortion loss, O(N) closed form.

Replaces the reference's external CUDA op ``eff_distloss_native``
(torch_efficient_distloss; used at reference train.py:24,421-423) with the
numerically identical prefix-sum formulation in pure jnp:

  L = sum_ij w_i w_j |m_i - m_j|  +  (1/3) sum_i w_i^2 * interval_i

For sorted midpoints m the pairwise term collapses to

  2 * sum_i w_i * (m_i * P_i - Q_i),
      P_i = sum_{j<i} w_j,   Q_i = sum_{j<i} w_j m_j,

which XLA computes with two cumsums — no N² blowup, no custom kernel needed.
The scalar result matches eff_distloss_native's mean-over-rays convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def eff_distloss(weights: jnp.ndarray, midpoints: jnp.ndarray,
                 intervals: jnp.ndarray) -> jnp.ndarray:
  """Distortion loss.

  Args:
    weights:   [R, M] rendering weights of each interval.
    midpoints: [R, M] sorted (ascending) normalized interval midpoints.
    intervals: [R, M] interval lengths.

  Returns:
    scalar loss (mean over rays of the per-ray distortion).
  """
  w = weights
  m = midpoints
  # exclusive prefix sums along the sample axis
  p = jnp.cumsum(w, axis=-1) - w                  # sum_{j<i} w_j
  q = jnp.cumsum(w * m, axis=-1) - w * m          # sum_{j<i} w_j m_j
  cross = 2.0 * jnp.sum(w * (m * p - q), axis=-1)
  self_term = jnp.sum(w * w * intervals, axis=-1) / 3.0
  return jnp.mean(cross + self_term)


def eff_distloss_pairwise(weights: jnp.ndarray, midpoints: jnp.ndarray,
                          intervals: jnp.ndarray) -> jnp.ndarray:
  """O(N²) direct evaluation — used only by tests as a golden reference."""
  diff = jnp.abs(midpoints[..., :, None] - midpoints[..., None, :])
  pair = jnp.sum(weights[..., :, None] * weights[..., None, :] * diff,
                 axis=(-1, -2))
  self_term = jnp.sum(weights * weights * intervals, axis=-1) / 3.0
  return jnp.mean(pair + self_term)
