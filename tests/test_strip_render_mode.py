"""Strip-sampling speed mode through the full render core.

With a full-image strip (rows/cols >= featmap extents) every sample is
covered, so the strip render must match the exact per-sample-gather render
to accumulation precision.  With production strip extents the uncovered
samples fold out through the mask, so outputs stay finite and close.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_ff_batch, synthetic_mono_batch
from dynibar_tpu.models.dynibar import FFModel, MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono, render_rays_mv


def _run_ff(cfg, n_rays=12, h=32, w=64):
  # h=32: the pallas sampler's 2x16-row window then covers the whole
  # image, so every sample is exact regardless of ray coherence
  model = FFModel(cfg=cfg, num_frames=24)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg, n_rays=n_rays, h=h, w=w, num_frames=24).items()}
  coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])[1])
  fine = (model.apply_feature(params, "feature_net_fine", rb["src_rgbs"])[0],
          None,
          model.apply_feature(params, "feature_net_fine",
                              rb["static_src_rgbs"])[1])

  @jax.jit
  def f(params, rb):
    return render_rays_mv(model, params, rb, coarse, fine, cfg, det=True)

  return f(params, rb)


import pytest


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_full_image_strip_matches_exact_ff(impl):
  kwargs = dict(n_samples=8, n_importance=8, num_views_dy=7,
                num_views_anchor=0, num_views_static=4, num_vv=0,
                num_basis=4, inv_uniform=True)
  exact = _run_ff(RenderSettings(**kwargs))
  # featmaps for a 32x64 source are 8x16 -> a 16x16 xla strip (or the
  # pallas 32-row window) covers everything
  strip = _run_ff(RenderSettings(strip_sampling=True, strip_rows=16,
                                 strip_cols=16, strip_impl=impl, **kwargs))
  for key in ("outputs_coarse_ref", "outputs_fine_ref"):
    np.testing.assert_allclose(np.asarray(exact[key]["rgb"]),
                               np.asarray(strip[key]["rgb"]),
                               rtol=0, atol=3e-5)


def test_partial_strip_stays_close_ff():
  kwargs = dict(n_samples=8, n_importance=8, num_views_dy=7,
                num_views_anchor=0, num_views_static=4, num_vv=0,
                num_basis=4, inv_uniform=True)
  exact = _run_ff(RenderSettings(**kwargs))
  # xla impl with deliberately tiny strips: exercises uncovered-sample
  # masking (the pallas window would cover these small maps entirely)
  strip = _run_ff(RenderSettings(strip_sampling=True, strip_rows=8,
                                 strip_cols=12, strip_impl="xla", **kwargs))
  rgb_e = np.asarray(exact["outputs_fine_ref"]["rgb"])
  rgb_s = np.asarray(strip["outputs_fine_ref"]["rgb"])
  assert np.isfinite(rgb_s).all()
  assert np.abs(rgb_e - rgb_s).mean() < 0.05


def test_mono_eval_strip_and_train_guard():
  kwargs = dict(n_samples=8, num_views_dy=9, num_views_anchor=10,
                num_views_static=6, num_vv=3, num_basis=4)
  cfg = RenderSettings(**kwargs)
  cfg_s = RenderSettings(strip_sampling=True, strip_rows=16, strip_cols=16,
                         **kwargs)
  model = MonoModel(cfg=cfg, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=12, h=32, w=64, num_frames=32).items()}

  def run(m, c, is_train):
    @jax.jit
    def f(params, rb):
      dy, _ = m.apply_feature(params, rb["src_rgbs"])
      anchor, _ = m.apply_feature(params, rb["anchor_src_rgbs"])
      st, _ = m.apply_feature_st(params, rb["static_src_rgbs"])
      return render_rays_mono(m, params, rb, (dy, anchor, st), c,
                              is_train=is_train, det=True,
                              rng=jax.random.PRNGKey(1))
    return f(params, rb)

  exact = run(model, cfg, False)
  strip = run(MonoModel(cfg=cfg_s, num_frames=32), cfg_s, False)
  np.testing.assert_allclose(
      np.asarray(exact["outputs_coarse_ref"]["rgb"]),
      np.asarray(strip["outputs_coarse_ref"]["rgb"]), rtol=0, atol=3e-5)

  # training ignores strip_sampling (keeps the custom-VJP gather): the
  # training forward must match the plain config's bit for bit
  t_exact = run(model, cfg, True)
  t_strip = run(MonoModel(cfg=cfg_s, num_frames=32), cfg_s, True)
  np.testing.assert_array_equal(
      np.asarray(t_exact["outputs_coarse_anchor"]["rgb"]),
      np.asarray(t_strip["outputs_coarse_anchor"]["rgb"]))


def test_scanline_batch_and_config_flags(tmp_path):
  from dynibar_tpu.config import DynibarConfig
  rb = synthetic_ff_batch(RenderSettings(num_views_static=4, num_vv=0),
                          n_rays=64, h=16, w=24, scanline=True)
  uv = rb["uv_grid"]
  flat = uv[:, 1] * 24 + uv[:, 0]
  assert np.all(np.diff(flat) % (16 * 24) == 1)  # contiguous pixel block

  cfg_file = tmp_path / "c.txt"
  cfg_file.write_text("strip_sampling = True\nstrip_impl = xla\n"
                      "strip_rows = 8\n")
  cfg = DynibarConfig.from_file(str(cfg_file))
  rs = cfg.render_settings("ff")
  assert rs.strip_sampling and rs.strip_impl == "xla" and rs.strip_rows == 8


def test_auto_exact_fallback_matches_exact_render():
  """Chunks with coverage misses are re-rendered exactly (render_image)."""
  from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                               render_image_ff)
  kwargs = dict(n_samples=8, n_importance=8, num_views_dy=7,
                num_views_anchor=0, num_views_static=4, num_vv=0,
                num_basis=4, inv_uniform=True)
  cfg = RenderSettings(**kwargs)
  cfg_s = RenderSettings(strip_sampling=True, **kwargs)
  # tall image: 96 rows >> the 32-row pallas window, so some chunks miss
  h, w = 96, 32
  model = FFModel(cfg=cfg, num_frames=24)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg, n_rays=4, h=h, w=w, num_frames=24).items()}
  coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])[1])
  fine = (model.apply_feature(params, "feature_net_fine", rb["src_rgbs"])[0],
          None,
          model.apply_feature(params, "feature_net_fine",
                              rb["static_src_rgbs"])[1])
  rb = full_image_ray_batch(rb, rb["camera"], render_stride=4)
  hh, ww = h // 4, w // 4

  exact = render_image_ff(model, params, rb, coarse, fine, cfg, 64, hh, ww)
  stats = {}
  fast = render_image_ff(FFModel(cfg=cfg_s, num_frames=24), params, rb,
                         coarse, fine, cfg_s, 64, hh, ww, stats=stats)
  assert stats["chunks"] == (hh * ww + 63) // 64
  # the tall image forces coverage misses on the full-res RGB windows:
  # those chunks MUST have been re-rendered through the exact program
  assert stats["exact_fallback_chunks"] >= 1
  # covered chunks differ only by MXU accumulation order, amplified
  # through the MLP chain (~3e-5 at f32; dropped samples would be ~0.9)
  np.testing.assert_allclose(
      np.asarray(exact["outputs_fine_ref"]["rgb"]),
      np.asarray(fast["outputs_fine_ref"]["rgb"]), rtol=0, atol=1e-4)


def test_full_image_strip_mesh_matches_exact():
  """The v5e-8 eval combination: strip sampling + auto-exact fallback +
  mesh-sharded chunks must still equal the exact single-device render."""
  from dynibar_tpu.parallel.mesh import make_mesh
  from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                               render_image_ff)

  kwargs = dict(n_samples=8, n_importance=8, num_views_dy=7,
                num_views_anchor=0, num_views_static=4, num_vv=0,
                num_basis=4, inv_uniform=True)
  cfg_e = RenderSettings(**kwargs)
  cfg_s = RenderSettings(strip_sampling=True, strip_rows=16, strip_cols=16,
                         **kwargs)
  h, w = 24, 32
  model = FFModel(cfg=cfg_e, num_frames=24)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg_e, n_rays=8, h=h, w=w, num_frames=24).items()}
  eval_rb = full_image_ray_batch(rb, rb["camera"])
  coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])[1])
  fine = (model.apply_feature(params, "feature_net_fine",
                              rb["src_rgbs"])[0],
          None,
          model.apply_feature(params, "feature_net_fine",
                              rb["static_src_rgbs"])[1])

  exact = render_image_ff(model, params, eval_rb, coarse, fine, cfg_e,
                          chunk_size=64, height=h, width=w)
  mesh = make_mesh(jax.devices()[:8])
  model_s = FFModel(cfg=cfg_s, num_frames=24)
  strip = render_image_ff(model_s, params, eval_rb, coarse, fine, cfg_s,
                          chunk_size=64, height=h, width=w, mesh=mesh)
  np.testing.assert_allclose(
      np.asarray(exact["outputs_fine_ref"]["rgb"]),
      np.asarray(strip["outputs_fine_ref"]["rgb"]), rtol=0, atol=3e-5)
