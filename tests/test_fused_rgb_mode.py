"""Fused-RGB sampling speed mode: runs and stays near the exact render."""

import numpy as np
import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono


def test_fused_rgb_close_to_exact():
  kwargs = dict(n_samples=16, num_views_dy=9, num_views_anchor=10,
                num_views_static=6, num_vv=3, num_basis=4)
  cfg = RenderSettings(**kwargs)
  cfg_f = RenderSettings(fused_rgb_sampling=True, **kwargs)
  model = MonoModel(cfg=cfg, num_frames=32)
  model_f = MonoModel(cfg=cfg_f, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=16, h=32, w=48, num_frames=32).items()}

  def run(m, c):
    @jax.jit
    def f(params, rb):
      dy, _ = m.apply_feature(params, rb["src_rgbs"])
      anchor, _ = m.apply_feature(params, rb["anchor_src_rgbs"])
      st, _ = m.apply_feature_st(params, rb["static_src_rgbs"])
      return render_rays_mono(m, params, rb, (dy, anchor, st), c,
                              is_train=False, det=True)
    return f(params, rb)["outputs_coarse_ref"]

  exact = run(model, cfg)
  fused = run(model_f, cfg_f)
  rgb_e = np.asarray(exact["rgb"])
  rgb_f = np.asarray(fused["rgb"])
  assert np.isfinite(rgb_f).all()
  # at this tiny test scale the featmap is only 8x12, so the RGB is very
  # coarse; still must track the exact render (real scenes use 72x128+)
  assert np.abs(rgb_e - rgb_f).mean() < 0.08
