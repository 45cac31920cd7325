"""Strip sampler vs the exact per-sample bilinear gather.

Covered samples must match ops.grid_sample exactly (it is the parity
reference for torch grid_sample); uncovered samples must be flagged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynibar_tpu.ops.grid_sample import bilinear_sample_views
from dynibar_tpu.ops.strip_sample import strip_sample_views


def _line_grids(key, v, r, s, max_span_x, max_span_y):
  """Random epipolar-like segments: per (view, ray), s points on a line."""
  k1, k2, k3 = jax.random.split(key, 3)
  start = jax.random.uniform(k1, (v, r, 1, 2), minval=-0.9, maxval=0.9)
  span = jax.random.uniform(
      k2, (v, r, 1, 2), minval=-1.0, maxval=1.0) * jnp.array(
          [max_span_x, max_span_y])
  t = jnp.sort(jax.random.uniform(k3, (v, r, s, 1)), axis=2)
  return start + t * span


def test_covered_matches_exact_sampler():
  v, r, s, h, w, c = 3, 17, 12, 40, 64, 5
  key = jax.random.PRNGKey(0)
  fm = jax.random.normal(key, (v, h, w, c), jnp.float32)
  # spans small enough that strips (16 x 32) always cover
  grid = _line_grids(jax.random.PRNGKey(1), v, r, s,
                     max_span_x=0.6, max_span_y=0.5)

  vals, covered = jax.jit(
      lambda f, g: strip_sample_views(f, g, rows=16, cols=32, ray_tile=8)
  )(fm, grid)
  ref = bilinear_sample_views(fm, grid.reshape(v, r * s, 2),
                              image_grad=False).reshape(v, r, s, c)
  assert bool(jnp.all(covered))
  np.testing.assert_allclose(np.asarray(vals), np.asarray(ref),
                             rtol=0, atol=1e-5)


def test_out_of_image_and_sentinel_points():
  """Out-of-image points must neither break coverage nor corrupt values."""
  v, r, s, h, w, c = 2, 9, 8, 24, 48, 4
  fm = jax.random.normal(jax.random.PRNGKey(2), (v, h, w, c), jnp.float32)
  grid = _line_grids(jax.random.PRNGKey(3), v, r, s, 0.5, 0.5)
  # push some points out of the image / to the projector's clip sentinel
  grid = grid.at[:, 0, :3].set(jnp.array([[-1e6, 3.0], [1.5, 0.2],
                                          [0.1, -1.2]]))
  vals, covered = strip_sample_views(fm, grid, rows=16, cols=32, ray_tile=4)
  ref = bilinear_sample_views(fm, grid.reshape(v, r * s, 2),
                              image_grad=False).reshape(v, r, s, c)
  assert bool(jnp.all(covered))  # invalid corners are vacuously covered
  np.testing.assert_allclose(np.asarray(vals), np.asarray(ref),
                             rtol=0, atol=1e-5)


def test_boundary_pixels_exact():
  """Points within one pixel of the border exercise the raw-corner paths."""
  v, h, w, c = 1, 16, 16, 3
  fm = jax.random.normal(jax.random.PRNGKey(4), (v, h, w, c), jnp.float32)
  eps = 0.3 / (w - 1)
  xs = jnp.array([-1.0, -1.0 + eps, 1.0 - eps, 1.0, -1.0 - eps, 1.0 + eps])
  grid = jnp.stack([xs, xs], axis=-1).reshape(1, 2, 3, 2)
  vals, covered = strip_sample_views(fm, grid, rows=16, cols=16)
  ref = bilinear_sample_views(fm, grid.reshape(v, -1, 2),
                              image_grad=False).reshape(vals.shape)
  np.testing.assert_allclose(np.asarray(vals), np.asarray(ref),
                             rtol=0, atol=1e-5)
  assert bool(jnp.all(covered))


def test_uncovered_is_flagged():
  v, r, s, h, w, c = 1, 4, 16, 64, 96, 2
  fm = jnp.ones((v, h, w, c), jnp.float32)
  # a segment spanning nearly the whole image cannot fit an 8x16 strip
  grid = _line_grids(jax.random.PRNGKey(5), v, r, s, 1.7, 1.7)
  _, covered = strip_sample_views(fm, grid, rows=8, cols=16, ray_tile=4)
  assert not bool(jnp.all(covered))
  # ...but a full-image strip covers everything in-image
  _, covered_full = strip_sample_views(fm, grid, rows=64, cols=96)
  assert bool(jnp.all(covered_full))


def test_bfloat16_path():
  v, r, s, h, w, c = 2, 8, 8, 32, 32, 4
  fm = jax.random.normal(jax.random.PRNGKey(6), (v, h, w, c),
                         jnp.float32).astype(jnp.bfloat16)
  grid = _line_grids(jax.random.PRNGKey(7), v, r, s, 0.4, 0.4)
  vals, covered = strip_sample_views(fm, grid, rows=16, cols=32, ray_tile=8)
  assert vals.dtype == jnp.bfloat16
  ref = bilinear_sample_views(fm, grid.reshape(v, r * s, 2),
                              image_grad=False).reshape(v, r, s, c)
  assert bool(jnp.all(covered))
  np.testing.assert_allclose(
      np.asarray(vals, np.float32), np.asarray(ref, np.float32),
      rtol=0, atol=2e-2)
