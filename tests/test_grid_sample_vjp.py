"""Custom-VJP bilinear sampler: gradients must match plain autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynibar_tpu.ops.grid_sample import (bilinear_sample,
                                         bilinear_sample_views)


def _naive_views(imgs, grids):
  return jax.vmap(bilinear_sample)(imgs, grids)


@pytest.fixture(scope="module")
def data():
  rng = np.random.RandomState(0)
  v, h, w, c, n = 3, 9, 13, 4, 64
  imgs = jnp.asarray(rng.rand(v, h, w, c).astype(np.float32))
  # mix of interior, borderline, and out-of-range points
  grids = jnp.asarray((rng.rand(v, n, 2) * 2.6 - 1.3).astype(np.float32))
  cot = jnp.asarray(rng.randn(v, n, c).astype(np.float32))
  return imgs, grids, cot


def test_forward_equals_naive(data):
  imgs, grids, _ = data
  np.testing.assert_allclose(
      np.asarray(bilinear_sample_views(imgs, grids)),
      np.asarray(_naive_views(imgs, grids)), atol=1e-6)


def test_image_gradient_matches_autodiff(data):
  imgs, grids, cot = data
  def loss_custom(im):
    return jnp.sum(bilinear_sample_views(im, grids, image_grad=True) * cot)
  def loss_naive(im):
    return jnp.sum(_naive_views(im, grids) * cot)
  g_c = jax.grad(loss_custom)(imgs)
  g_n = jax.grad(loss_naive)(imgs)
  np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_n),
                             atol=2e-5, rtol=1e-4)


def test_grid_gradient_matches_autodiff(data):
  imgs, grids, cot = data
  def loss_custom(g):
    return jnp.sum(bilinear_sample_views(imgs, g, image_grad=True) * cot)
  def loss_naive(g):
    return jnp.sum(_naive_views(imgs, g) * cot)
  g_c = jax.grad(loss_custom)(grids)
  g_n = jax.grad(loss_naive)(grids)
  np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_n),
                             atol=2e-4, rtol=1e-3)


def test_grid_gradient_also_flows_with_image_grad_off(data):
  imgs, grids, cot = data
  def loss(g):
    return jnp.sum(bilinear_sample_views(imgs, g, image_grad=False) * cot)
  g = jax.grad(loss)(grids)
  want = jax.grad(
      lambda g: jnp.sum(_naive_views(imgs, g) * cot))(grids)
  np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                             atol=2e-4, rtol=1e-3)


def test_image_grad_off_returns_zero_image_grad(data):
  imgs, grids, cot = data
  g = jax.grad(lambda im: jnp.sum(
      bilinear_sample_views(im, grids, image_grad=False) * cot))(imgs)
  assert float(jnp.abs(g).max()) == 0.0


def test_bf16_vjp_runs(data):
  imgs, grids, cot = data
  imgs16 = imgs.astype(jnp.bfloat16)
  def loss(im):
    out = bilinear_sample_views(im, grids, image_grad=True)
    return jnp.sum(out.astype(jnp.float32) * cot)
  g = jax.grad(loss)(imgs16)
  assert g.dtype == jnp.bfloat16
  assert np.isfinite(np.asarray(g, dtype=np.float32)).all()