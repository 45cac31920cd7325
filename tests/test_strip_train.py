"""Training through the gatherless Pallas sampler (strip_train mode).

Covers ops/pallas_sample.pallas_bilinear_sample_views_diff — the Pallas
primal with the gather path's custom-VJP backward (ops/grid_sample.py) —
and its integration into gradient-bearing render steps via
RenderSettings.strip_train (render/render_rays._strip_arg).
"""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.ops.grid_sample import bilinear_sample_views
from dynibar_tpu.ops.pallas_sample import pallas_bilinear_sample_views_diff
from dynibar_tpu.render.render_rays import render_rays_mono

V, R, S, H, W, C = 2, 16, 4, 24, 32, 8
GROUP = 8


def _coherent_grid(seed, y_span=0.02):
  """Per-GROUP nearly-constant y (tight epipolar windows), arbitrary x."""
  rng = np.random.RandomState(seed)
  y_base = rng.uniform(-0.7, 0.7, size=(V, R // GROUP, 1, 1))
  y = y_base + rng.uniform(-y_span, y_span, size=(V, R // GROUP, GROUP, S))
  x = rng.uniform(-0.95, 0.95, size=(V, R, S))
  grid = np.stack([x, y.reshape(V, R, S)], axis=-1).astype(np.float32)
  return jnp.asarray(grid)


@pytest.fixture(scope="module")
def fm():
  return jax.random.normal(jax.random.PRNGKey(0), (V, H, W, C),
                           dtype=jnp.float32)


def _loss_exact(fm_, grid, k):
  out = bilinear_sample_views(fm_, grid.reshape(V, R * S, 2),
                              image_grad=True)
  return jnp.sum(out * k.reshape(V, R * S, C))


def _loss_pallas(fm_, grid, k):
  out, covered = pallas_bilinear_sample_views_diff(
      fm_, grid, GROUP, 0, True, True)
  return jnp.sum(out * k), covered


def test_diff_sampler_gradients_match_exact(fm):
  """Full coverage => primal AND gradients identical to the gather path."""
  grid = _coherent_grid(1)
  k = jax.random.normal(jax.random.PRNGKey(2), (V, R, S, C))

  (lp, covered), g_p = jax.value_and_grad(
      _loss_pallas, argnums=(0, 1), has_aux=True)(fm, grid, k)
  assert bool(jnp.all(covered)), "test setup must be fully covered"
  le, g_e = jax.value_and_grad(_loss_exact, argnums=(0, 1))(fm, grid, k)

  np.testing.assert_allclose(float(lp), float(le), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(g_p[0]), np.asarray(g_e[0]),
                             atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(g_p[1]), np.asarray(g_e[1]),
                             atol=1e-5, rtol=1e-5)


def test_diff_sampler_uncovered_cotangents_zeroed():
  """With coverage misses, gradients equal the exact path under the same
  covered-masked cotangent — uncovered samples carry zero supervision.

  Needs a featmap taller than the kernel's 32-row window (H=96) so a
  wide-y group actually misses."""
  fm = jax.random.normal(jax.random.PRNGKey(9), (V, 96, W, C),
                         dtype=jnp.float32)
  grid = np.array(_coherent_grid(3))
  # blow up one group's y-span so its window cannot cover everything
  grid[:, :GROUP, :, 1] = np.linspace(-0.9, 0.9, GROUP * S).reshape(
      1, GROUP, S)
  grid = jnp.asarray(grid)
  k = jax.random.normal(jax.random.PRNGKey(4), (V, R, S, C))

  (_, covered), g_p = jax.value_and_grad(
      _loss_pallas, argnums=(0, 1), has_aux=True)(fm, grid, k)
  assert not bool(jnp.all(covered))
  assert bool(jnp.any(covered))

  k_masked = k * np.asarray(covered)[..., None]
  _, g_e = jax.value_and_grad(_loss_exact, argnums=(0, 1))(fm, grid,
                                                           k_masked)
  np.testing.assert_allclose(np.asarray(g_p[0]), np.asarray(g_e[0]),
                             atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(g_p[1]), np.asarray(g_e[1]),
                             atol=1e-5, rtol=1e-5)
  for g in g_p:
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_strip_train_render_gradients_match_exact():
  """render_rays_mono with strip_sampling+strip_train: loss and parameter
  gradients match the exact-gather training path (the tiny featmap fits any
  32-row window, so coverage is total and both programs compute the same
  math — only the sampler implementation differs)."""
  kwargs = dict(n_samples=8, num_views_dy=9, num_views_anchor=10,
                num_views_static=6, num_vv=3, num_basis=4)
  cfg = RenderSettings(**kwargs)
  cfg_s = RenderSettings(strip_sampling=True, strip_train=True, **kwargs)
  model = MonoModel(cfg=cfg, num_frames=32)
  model_s = MonoModel(cfg=cfg_s, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=16, h=32, w=64, num_frames=32).items()}

  def make_loss(m, c):
    def loss(p):
      dy, _ = m.apply_feature(p, rb["src_rgbs"])
      anchor, _ = m.apply_feature(p, rb["anchor_src_rgbs"])
      st, _ = m.apply_feature_st(p, rb["static_src_rgbs"])
      ret = render_rays_mono(m, p, rb, (dy, anchor, st), c,
                             is_train=True, det=True)
      out = ret["outputs_coarse_ref"]
      return (jnp.mean((out["rgb"] - rb["rgb"]) ** 2)
              + jnp.mean(out["depth"])
              + jnp.mean(ret["outputs_coarse_anchor"]["rgb"]))
    return loss

  le, ge = jax.value_and_grad(make_loss(model, cfg))(params)
  ls, gs = jax.value_and_grad(make_loss(model_s, cfg_s))(params)

  np.testing.assert_allclose(float(ls), float(le), rtol=1e-5)
  flat_e, _ = jax.flatten_util.ravel_pytree(ge)
  flat_s, _ = jax.flatten_util.ravel_pytree(gs)
  scale = np.abs(np.asarray(flat_e)).max() + 1e-8
  np.testing.assert_allclose(np.asarray(flat_s) / scale,
                             np.asarray(flat_e) / scale, atol=2e-5)


@pytest.mark.compileheavy
def test_full_train_step_production_combo_strip_train():
  """Trace/compile check of the PRODUCTION training combination with
  strip_train on: bf16 + fused Pallas aggregators (split backward) +
  remat + the Pallas-forward/gather-backward sampler, one full step
  through make_train_step (interpret-mode kernels on CPU, tiny shapes)."""
  from dynibar_tpu.config import DynibarConfig
  from dynibar_tpu.data.ray_batch import synthetic_mono_batch
  from dynibar_tpu.train import losses as losses_lib
  from dynibar_tpu.train import trainer as trainer_lib

  config = DynibarConfig(
      N_rand=8, N_samples=8, num_source_views=6, num_vv=3, num_basis=4,
      compute_dtype="bfloat16", use_remat=True, fused_aggregators=True,
      strip_sampling=True, strip_train=True, coherent_ray_segment=8)
  cfg = config.render_settings("mono")
  model = MonoModel(cfg=cfg, num_frames=32, remat=True)
  state, tx = trainer_lib.create_train_state(model, config,
                                             jax.random.PRNGKey(0))
  step = trainer_lib.make_train_step(model, tx, cfg, donate=False)
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=8, h=32, w=48, num_frames=32, scanline=True).items()}
  weights = losses_lib.schedule_weights(config, epoch=2)
  state2, metrics = step(state, rb, weights, jax.random.PRNGKey(1))
  assert np.isfinite(float(metrics["loss"]))
  leaf0 = jax.tree_util.tree_leaves(state.params)[0]
  leaf1 = jax.tree_util.tree_leaves(state2.params)[0]
  assert np.abs(np.asarray(leaf1) - np.asarray(leaf0)).max() > 0
