"""Sampling points along rays + importance (PDF) resampling.

Behavioral parity targets in the reference:
  * ``sample_along_camera_ray``  (ibrnet/render_ray.py:67-131)
  * ``sample_pdf``               (ibrnet/render_ray.py:19-64)
  * ``z_to_s`` mip-NeRF-360 normalized distance (ibrnet/render_ray.py:399-404)

All functions are batched over rays with plain array ops (no vmap needed),
fixed shapes, and take explicit PRNG keys so the callers stay pure.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def z_to_s(z_vals: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray
           ) -> jnp.ndarray:
  """Normalized inverse-depth distance (mip-NeRF 360)."""
  return ((1.0 / z_vals) - (1.0 / near)) / (1.0 / far - 1.0 / near)


def sample_along_ray(
    ray_o: jnp.ndarray,            # [R, 3]
    ray_d: jnp.ndarray,            # [R, 3]
    depth_range: jnp.ndarray,      # [2] (near, far)
    n_samples: int,
    inv_uniform: bool,
    det: bool,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Stratified samples along each ray.

  Returns (pts [R,S,3], z_vals [R,S], s_vals [R,S]).
  """
  near = depth_range[0]
  far = depth_range[1]
  n_rays = ray_o.shape[0]
  steps = jnp.arange(n_samples, dtype=ray_o.dtype)

  if inv_uniform:
    start = 1.0 / near
    step = (1.0 / far - start) / (n_samples - 1)
    inv_z = start + steps * step                       # [S]
    z_vals = jnp.broadcast_to(1.0 / inv_z, (n_rays, n_samples))
  else:
    step = (far - near) / (n_samples - 1)
    z_vals = jnp.broadcast_to(near + steps * step, (n_rays, n_samples))

  if not det:
    assert rng is not None, "stochastic sampling needs a PRNG key"
    mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
    upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
    t_rand = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
    z_vals = lower + (upper - lower) * t_rand

  pts = z_vals[..., None] * ray_d[:, None, :] + ray_o[:, None, :]
  s_vals = z_to_s(z_vals, near, far)
  return pts, z_vals, s_vals


def sample_pdf(
    bins: jnp.ndarray,      # [R, M+1] bin edges
    weights: jnp.ndarray,   # [R, M]
    n_samples: int,
    det: bool,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
  """Inverse-CDF importance sampling (same math as NeRF's sample_pdf).

  The reference's O(M·N) python loop over bins becomes a vectorized
  searchsorted, which XLA lowers to a sorted binary search — identical
  sample placement, TPU-friendly.
  """
  weights = weights + 1e-5
  pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)       # [R, M]
  cdf = jnp.cumsum(pdf, axis=-1)
  cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [R, M+1]

  n_rays, m = weights.shape
  if det:
    u = jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype)
    u = jnp.broadcast_to(u, (n_rays, n_samples))
  else:
    assert rng is not None
    u = jax.random.uniform(rng, (n_rays, n_samples), dtype=bins.dtype)

  # reference counts i in [0, M): above += (u >= cdf[:, i]); cdf[:,0] == 0 so
  # above ∈ [1, M].  Equivalent: searchsorted(cdf[:, :M], u, side='right').
  above = jax.vmap(
      lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf[:, :m], u)
  above = above.astype(jnp.int32)
  below = jnp.maximum(above - 1, 0)

  cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
  cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
  bins_below = jnp.take_along_axis(bins, below, axis=-1)
  bins_above = jnp.take_along_axis(bins, above, axis=-1)

  denom = cdf_above - cdf_below
  denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
  t = (u - cdf_below) / denom
  return bins_below + t * (bins_above - bins_below)


def importance_resample_z(
    z_vals: jnp.ndarray,       # [R, S] coarse depths (sorted)
    weights: jnp.ndarray,      # [R, S] coarse weights
    n_importance: int,
    inv_uniform: bool,
    det: bool,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
  """Coarse-to-fine depth resampling (reference render_ray.py:789-825).

  Returns the merged, sorted depth values [R, S + n_importance].
  """
  weights = jax.lax.stop_gradient(weights)
  if inv_uniform:
    inv_z = 1.0 / z_vals
    inv_mid = 0.5 * (inv_z[:, 1:] + inv_z[:, :-1])      # decreasing
    w = weights[:, 1:-1]
    # reference flips so bins are increasing before sampling
    inv_samples = sample_pdf(inv_mid[:, ::-1], w[:, ::-1], n_importance,
                             det=det, rng=rng)
    z_samples = 1.0 / inv_samples
  else:
    z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
    w = weights[:, 1:-1]
    z_samples = sample_pdf(z_mid, w, n_importance, det=det, rng=rng)

  z_all = jnp.concatenate([z_vals, z_samples], axis=-1)
  return jnp.sort(z_all, axis=-1)
