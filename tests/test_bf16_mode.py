"""bf16 mixed-precision mode: runs, stays close to the f32 render."""

import numpy as np
import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono


def test_bf16_render_close_to_f32():
  kwargs = dict(n_samples=16, num_views_dy=9, num_views_anchor=10,
                num_views_static=6, num_vv=3, num_basis=4)
  cfg32 = RenderSettings(**kwargs)
  cfg16 = RenderSettings(compute_dtype="bfloat16", **kwargs)

  model32 = MonoModel(cfg=cfg32, num_frames=32)
  model16 = MonoModel(cfg=cfg16, num_frames=32)
  params = model32.init_params(jax.random.PRNGKey(0))  # same param shapes

  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg32, n_rays=16, h=32, w=48, num_frames=32).items()}

  def run(model, cfg):
    @jax.jit
    def f(params, rb):
      dy, _ = model.apply_feature(params, rb["src_rgbs"])
      anchor, _ = model.apply_feature(params, rb["anchor_src_rgbs"])
      st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
      return render_rays_mono(model, params, rb, (dy, anchor, st), cfg,
                              is_train=False, det=True)
    return f(params, rb)

  out32 = run(model32, cfg32)["outputs_coarse_ref"]
  out16 = run(model16, cfg16)["outputs_coarse_ref"]

  rgb32 = np.asarray(out32["rgb"])
  rgb16 = np.asarray(out16["rgb"])
  assert np.isfinite(rgb16).all()
  # bf16 has ~3 decimal digits; rendered radiance should agree to ~1e-2
  assert np.abs(rgb32 - rgb16).max() < 3e-2
  d32 = np.asarray(out32["depth"])
  d16 = np.asarray(out16["depth"])
  assert np.abs(d32 - d16).max() / (np.abs(d32).max() + 1e-6) < 3e-2
