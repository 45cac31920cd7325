"""Layout-stable sampler->aggregator handoff (cfg.fused_handoff).

The channel-major path feeds the fused aggregators bit-identical inputs
to the standard [R,S,V,3+C] interchange — only the layout glue differs —
so outputs must match exactly (same kernels, same values).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_ff_batch, synthetic_mono_batch
from dynibar_tpu.models.dynibar import FFModel, MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono, render_rays_mv

KW = dict(n_samples=8, num_views_dy=7, num_views_anchor=0,
          num_views_static=4, num_vv=0, num_basis=4, inv_uniform=True,
          compute_dtype="bfloat16", fused_aggregators=True,
          strip_sampling=True)


def _cfgs(**extra):
  base = dict(KW, **extra)
  return (RenderSettings(fused_handoff=False, **base),
          RenderSettings(fused_handoff=True, **base))


@pytest.mark.parametrize("fused_rgb", [False, True])
def test_ff_cm_handoff_matches_standard(fused_rgb):
  cfg_std, cfg_cm = _cfgs(n_importance=8, fused_rgb_sampling=fused_rgb)
  model = FFModel(cfg=cfg_std, num_frames=24)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg_std, n_rays=8, h=32, w=64, num_frames=24, scanline=True).items()}
  coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])[1])
  fine = (model.apply_feature(params, "feature_net_fine", rb["src_rgbs"])[0],
          None,
          model.apply_feature(params, "feature_net_fine",
                              rb["static_src_rgbs"])[1])

  outs = {}
  for tag, cfg in (("std", cfg_std), ("cm", cfg_cm)):
    m = FFModel(cfg=cfg, num_frames=24)

    @jax.jit
    def f(params, rb, m=m, cfg=cfg):
      cov = []
      ret = render_rays_mv(m, params, rb, coarse, fine, cfg, det=True,
                           cov_out=cov)
      return ret, jnp.stack(cov)

    outs[tag] = f(params, rb)

  for key in ("outputs_coarse_ref", "outputs_fine_ref"):
    for field in ("rgb", "depth", "mask"):
      np.testing.assert_array_equal(
          np.asarray(outs["std"][0][key][field]),
          np.asarray(outs["cm"][0][key][field]),
          err_msg=f"{key}/{field}")
  np.testing.assert_array_equal(np.asarray(outs["std"][1]),
                                np.asarray(outs["cm"][1]))


def test_mono_cm_handoff_matches_standard():
  kw = dict(n_samples=8, num_views_dy=9, num_views_anchor=10,
            num_views_static=6, num_vv=3, num_basis=4,
            compute_dtype="bfloat16", fused_aggregators=True,
            strip_sampling=True)
  cfg_std = RenderSettings(fused_handoff=False, **kw)
  cfg_cm = RenderSettings(fused_handoff=True, **kw)
  model = MonoModel(cfg=cfg_std, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg_std, n_rays=8, h=32, w=64, num_frames=32, scanline=True).items()}
  dy, _ = model.apply_feature(params, rb["src_rgbs"])
  st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])

  outs = {}
  for tag, cfg in (("std", cfg_std), ("cm", cfg_cm)):
    m = MonoModel(cfg=cfg, num_frames=32)

    @jax.jit
    def f(params, rb, m=m, cfg=cfg):
      return render_rays_mono(m, params, rb, (dy, None, st), cfg,
                              is_train=False, det=True)

    outs[tag] = f(params, rb)

  for key in ("outputs_coarse_ref", "outputs_coarse_st"):
    for field in ("rgb", "depth"):
      np.testing.assert_array_equal(
          np.asarray(outs["std"][key][field]),
          np.asarray(outs["cm"][key][field]),
          err_msg=f"{key}/{field}")


def test_mono_train_view_render_under_handoff():
  """Regression (VERDICT r4 weak #1): render_rays_mono with is_train=True
  but needs_grad=False — exactly what cli.train's i_img panel does via
  render_image_mono(train_view=True) — took the cm-handoff branch, which
  never bound ``strip``, then passed ``strip=strip`` to the cross-time
  branch: UnboundLocalError on any training config with
  strip_sampling=true.  Must render cleanly and match the non-handoff
  train-view render on the shared fields."""
  from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                               render_image_mono)
  from dynibar_tpu.train.trainer import compute_featmaps

  kw = dict(n_samples=8, num_views_dy=9, num_views_anchor=10,
            num_views_static=6, num_vv=3, num_basis=4,
            compute_dtype="bfloat16", fused_aggregators=True,
            strip_sampling=True)
  cfg_std = RenderSettings(fused_handoff=False, **kw)
  cfg_cm = RenderSettings(fused_handoff=True, **kw)
  h, w = 12, 16
  model = MonoModel(cfg=cfg_cm, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg_cm, n_rays=8, h=h, w=w, num_frames=32).items()}
  full_rb = full_image_ray_batch(rb, rb["camera"])
  featmaps = compute_featmaps(model, params, full_rb)

  outs = {}
  for tag, cfg in (("std", cfg_std), ("cm", cfg_cm)):
    m = MonoModel(cfg=cfg, num_frames=32)
    outs[tag] = render_image_mono(m, params, full_rb, featmaps, cfg,
                                  chunk_size=64, height=h, width=w,
                                  train_view=True)

  anchor = outs["cm"]["outputs_coarse_anchor"]
  assert anchor["rgb"].shape == (h, w, 3)
  assert np.isfinite(np.asarray(anchor["occ_weight_map"])).all()
  for key in ("outputs_coarse_ref", "outputs_coarse_anchor"):
    np.testing.assert_array_equal(
        np.asarray(outs["std"][key]["rgb"]),
        np.asarray(outs["cm"][key]["rgb"]), err_msg=key)


def test_cm_handoff_ray_padding():
  """Ray counts that don't fill the aggregator tile exercise the
  trailing-axis pad path (pv_cm r_pad branch)."""
  cfg_std, cfg_cm = _cfgs(n_importance=8)
  model = FFModel(cfg=cfg_cm, num_frames=24)
  params = model.init_params(jax.random.PRNGKey(0))
  # 5 rays * 16 samples = 80 points: forces r_pad at every tile size
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg_cm, n_rays=5, h=32, w=64, num_frames=24, scanline=True).items()}
  coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])[1])
  fine = (model.apply_feature(params, "feature_net_fine", rb["src_rgbs"])[0],
          None,
          model.apply_feature(params, "feature_net_fine",
                              rb["static_src_rgbs"])[1])
  std = render_rays_mv(FFModel(cfg=cfg_std, num_frames=24), params, rb,
                       coarse, fine, cfg_std, det=True)
  cm = render_rays_mv(model, params, rb, coarse, fine, cfg_cm, det=True)
  np.testing.assert_array_equal(
      np.asarray(std["outputs_fine_ref"]["rgb"]),
      np.asarray(cm["outputs_fine_ref"]["rgb"]))
