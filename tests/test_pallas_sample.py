"""Gatherless Pallas sampler vs the exact per-sample bilinear gather.

Runs in interpret mode on the CPU test mesh; the Mosaic-compiled path is
exercised on real TPUs (bench.py with DYNIBAR_BENCH_STRIP=pallas).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.ops.grid_sample import bilinear_sample_views
from dynibar_tpu.ops.pallas_sample import pallas_bilinear_sample_views


def _scanline_grids(v, r, s, w_img, h_img):
  """Adjacent rays with nearly identical epipolar segments (eval order)."""
  base = jnp.linspace(-0.4, 0.4, r).reshape(1, r, 1, 1)
  t = jnp.linspace(0.0, 1.0, s).reshape(1, 1, s, 1)
  gx = base * 0.3 - 0.3 + t * 0.55
  gy = base * 0.05 + 0.05 + t * 0.12
  return jnp.broadcast_to(jnp.concatenate([gx, gy], -1), (v, r, s, 2))


def test_matches_exact_sampler():
  v, r, s, h, w, c = 2, 24, 16, 40, 64, 5
  fm = jax.random.normal(jax.random.PRNGKey(0), (v, h, w, c), jnp.float32)
  grid = _scanline_grids(v, r, s, w, h)
  vals, covered = pallas_bilinear_sample_views(fm, grid, group=8,
                                               interpret=True)
  ref = bilinear_sample_views(fm, grid.reshape(v, r * s, 2),
                              image_grad=False).reshape(v, r, s, c)
  assert bool(jnp.all(covered))
  np.testing.assert_allclose(np.asarray(vals), np.asarray(ref),
                             rtol=0, atol=1e-5)


def test_out_of_image_and_boundaries():
  v, r, s, h, w, c = 1, 8, 8, 32, 48, 3
  fm = jax.random.normal(jax.random.PRNGKey(1), (v, h, w, c), jnp.float32)
  grid = _scanline_grids(v, r, s, w, h)
  # out-of-image / sentinel / border-straddling points
  grid = grid.at[:, 0, :4].set(jnp.array(
      [[-1e6, 2.0], [1.4, 0.1], [-1.0, -1.0], [1.0 - 1e-3, 1.0 - 1e-3]]))
  vals, covered = pallas_bilinear_sample_views(fm, grid, group=4,
                                               interpret=True)
  ref = bilinear_sample_views(fm, grid.reshape(v, r * s, 2),
                              image_grad=False).reshape(v, r, s, c)
  m = np.asarray(covered)[..., None]
  np.testing.assert_allclose(np.asarray(vals) * m, np.asarray(ref) * m,
                             rtol=0, atol=1e-5)


def test_uncovered_flagged_not_garbage():
  v, r, s, h, w, c = 1, 8, 12, 64, 48, 4
  fm = jax.random.normal(jax.random.PRNGKey(2), (v, h, w, c), jnp.float32)
  # vertical segments spanning ~56 rows: cannot fit the 32-row window
  t = jnp.linspace(0.0, 1.0, s).reshape(1, 1, s, 1)
  gx = jnp.zeros((1, r, 1, 1)) + 0.1
  gy = -0.8 + t * 1.6
  grid = jnp.broadcast_to(jnp.concatenate(
      [jnp.broadcast_to(gx, (1, r, s, 1)),
       jnp.broadcast_to(gy, (1, r, s, 1))], -1), (v, r, s, 2))
  vals, covered = pallas_bilinear_sample_views(fm, grid, group=8,
                                               interpret=True)
  cov = np.asarray(covered)
  assert not cov.all() and cov.any()
  ref = bilinear_sample_views(fm, grid.reshape(v, r * s, 2),
                              image_grad=False).reshape(v, r, s, c)
  m = cov[..., None]
  np.testing.assert_allclose(np.asarray(vals) * m, np.asarray(ref) * m,
                             rtol=0, atol=1e-5)


def test_bfloat16_and_ray_padding():
  v, r, s, h, w, c = 2, 11, 8, 24, 32, 6   # r not a multiple of group
  fm = jax.random.normal(jax.random.PRNGKey(3), (v, h, w, c),
                         jnp.float32).astype(jnp.bfloat16)
  grid = _scanline_grids(v, r, s, w, h)
  vals, covered = pallas_bilinear_sample_views(fm, grid, group=8,
                                               interpret=True)
  assert vals.shape == (v, r, s, c) and vals.dtype == jnp.bfloat16
  assert bool(jnp.all(covered))
  ref = bilinear_sample_views(fm, grid.reshape(v, r * s, 2),
                              image_grad=False).reshape(v, r, s, c)
  np.testing.assert_allclose(
      np.asarray(vals, np.float32), np.asarray(ref, np.float32),
      rtol=0, atol=3e-2)
