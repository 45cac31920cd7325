"""End-to-end render-core tests on a synthetic scene (CPU, tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.core import composite as comp
from dynibar_tpu.core import projection as proj
from dynibar_tpu.data.ray_batch import synthetic_ff_batch, synthetic_mono_batch
from dynibar_tpu.models.dynibar import FFModel, MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono, render_rays_mv

TINY = RenderSettings(
    n_samples=16, n_importance=8, num_views_dy=9, num_views_anchor=10,
    num_views_static=6, num_vv=3, num_basis=4)


def _featmaps(model, params, rb, cfg):
  dy, _ = model.apply_feature(params, rb["src_rgbs"])
  anchor, _ = model.apply_feature(params, rb["anchor_src_rgbs"])
  st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
  return dy, anchor, st


@pytest.fixture(scope="module")
def mono_setup():
  cfg = TINY
  model = MonoModel(cfg=cfg, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=24, h=48, w=64, num_frames=32).items()}

  # jit once per (is_train, det) program — eager per-op dispatch is
  # impractically slow on this backend, and jit is the real TPU path anyway
  @jax.jit
  def run_train(params, rb, rng):
    fm = _featmaps(model, params, rb, cfg)
    return render_rays_mono(model, params, rb, fm, cfg,
                            is_train=True, det=False, rng=rng)

  @jax.jit
  def run_eval(params, rb):
    fm = _featmaps(model, params, rb, cfg)
    return render_rays_mono(model, params, rb, fm, cfg,
                            is_train=False, det=True)

  return cfg, model, params, rb, run_train, run_eval


def test_projection_roundtrip(mono_setup):
  """A point on a source-camera ray projects back to its pixel."""
  cfg, model, params, rb, _, _ = mono_setup
  cam = np.asarray(rb["src_cameras"][0], dtype=np.float64)
  k = cam[2:18].reshape(4, 4)
  c2w = cam[18:34].reshape(4, 4)
  pix = np.array([[10.0, 20.0, 1.0], [30.0, 7.0, 1.0]])
  depth = np.array([3.0, 5.0])
  dirs = (c2w[:3, :3] @ (np.linalg.inv(k[:3, :3]) @ pix.T)).T
  pts = c2w[:3, 3] + dirs * depth[:, None]             # [2, 3]
  pts_v = jnp.asarray(pts, jnp.float32)[None, :, None, :]  # [V=1,R=2,S=1,3]
  pixel_xy, in_front = proj.project_points(pts_v, rb["src_cameras"][:1])
  np.testing.assert_allclose(np.asarray(pixel_xy[0, :, 0]),
                             pix[:, :2], rtol=1e-3, atol=1e-2)
  assert bool(in_front.all())


def test_render_rays_mono_shapes_and_invariants(mono_setup):
  cfg, model, params, rb, run_train, _ = mono_setup
  ret = run_train(params, rb, jax.random.PRNGKey(1))
  r, s = 24, cfg.n_samples
  out = ret["outputs_coarse_ref"]
  assert out["rgb"].shape == (r, 3)
  assert out["depth"].shape == (r,)
  assert out["weights"].shape == (r, s)
  assert out["render_flows"].shape == (6, r, 2)
  assert out["exp_sf"].shape == (r, 3)
  # weights in [0, 1], sums <= 1 (SURVEY.md §4 invariant)
  w = np.asarray(out["weights"])
  assert w.min() >= 0 and w.sum(-1).max() <= 1.0 + 1e-4
  for key in ("weights_dy", "weights_st"):
    assert np.asarray(out[key]).sum(-1).max() <= 1.0 + 1e-4
  # rgb finite and in range (sigmoid/blend of real colors)
  rgb = np.asarray(out["rgb"])
  assert np.isfinite(rgb).all()

  anchor = ret["outputs_coarse_anchor"]
  assert anchor["occ_weights"].shape == (r, s)
  assert anchor["occ_weight_map"].shape == (r,)
  assert anchor["pts_traj_ref"].shape == anchor["pts_traj_anchor"].shape
  assert anchor["sf_seq"].shape == (6, r, s, 3)
  assert np.isfinite(np.asarray(anchor["rgb"])).all()
  ow = np.asarray(anchor["occ_weights"])
  assert ow.min() >= -1e-5 and ow.max() <= 1.0 + 1e-5

  st = ret["outputs_coarse_st"]
  assert st["rgb"].shape == (r, 3)


def test_render_rays_mono_eval_mode_skips_anchor(mono_setup):
  cfg, model, params, rb, _, run_eval = mono_setup
  ret = run_eval(params, rb)
  assert "outputs_coarse_anchor" not in ret
  assert np.isfinite(np.asarray(ret["outputs_coarse_ref"]["rgb"])).all()


def test_render_rays_mono_jits_and_is_deterministic(mono_setup):
  cfg, model, params, rb, _, run_eval = mono_setup
  a = run_eval(params, rb)
  b = run_eval(params, rb)
  np.testing.assert_allclose(np.asarray(a["outputs_coarse_ref"]["rgb"]),
                             np.asarray(b["outputs_coarse_ref"]["rgb"]))


def test_padded_views_do_not_change_result(mono_setup):
  """Invalid (padded) views must contribute exactly nothing."""
  cfg, model, params, rb, _, run_eval = mono_setup
  rb2 = dict(rb)
  # corrupt the padded static views' pixels; validity mask should shield
  sv = np.asarray(rb["static_valid"])
  if sv.min() > 0:  # force one view invalid for the test
    sv = sv.copy(); sv[-1] = 0.0
    rb2["static_valid"] = jnp.asarray(sv)
  base = run_eval(params, rb2)
  imgs = np.asarray(rb["static_src_rgbs"]).copy()
  imgs[sv == 0] = 7.7
  rb2["static_src_rgbs"] = jnp.asarray(imgs)
  got = run_eval(params, rb2)
  np.testing.assert_allclose(
      np.asarray(got["outputs_coarse_ref"]["rgb_static"]),
      np.asarray(base["outputs_coarse_ref"]["rgb_static"]), atol=1e-6)


def test_render_rays_mv_coarse_fine():
  cfg = RenderSettings(
      n_samples=16, n_importance=8, num_views_dy=7, num_views_anchor=0,
      num_views_static=6, num_vv=0, num_basis=4, inv_uniform=True)
  model = FFModel(cfg=cfg, num_frames=48)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg, n_rays=16, h=48, w=64, num_frames=48).items()}
  @jax.jit
  def run_ff(params, rb):
    coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
              None,
              model.apply_feature(params, "feature_net",
                                  rb["static_src_rgbs"])[1])
    fine = (model.apply_feature(params, "feature_net_fine",
                                rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net_fine",
                                rb["static_src_rgbs"])[1])
    return render_rays_mv(model, params, rb, coarse, fine, cfg, det=True)

  ret = run_ff(params, rb)
  s_total = cfg.n_samples + cfg.n_importance
  assert ret["outputs_fine_ref"]["rgb"].shape == (16, 3)
  assert ret["outputs_fine_ref"]["weights"].shape == (16, s_total)
  assert ret["outputs_fine_ref"]["render_flows"].shape == (7, 16, 2)
  z = np.asarray(ret["outputs_fine_ref"]["z_vals"])
  assert (np.diff(z, axis=-1) >= -1e-6).all(), "fine z_vals must be sorted"
  assert np.isfinite(np.asarray(ret["outputs_fine_ref"]["rgb"])).all()


def test_render_optical_flow_zero_coverage_ray_is_finite():
  """A ray with no source-view coverage has weights == 0, so the expected
  trajectory point is the origin and the perspective divide is 0/0 — the
  guarded divide must return finite flow (the NaN would otherwise poison
  the masked flow loss: NaN * 0 = NaN).  Reference divides unguarded
  (render_ray.py:352-354) and would NaN on such rays."""
  from dynibar_tpu.core.cameras import intrinsics_from_hwf, make_camera
  v, r, s = 3, 5, 4
  rng = np.random.RandomState(0)
  weights = jnp.asarray(rng.rand(r, s).astype(np.float32))
  weights = weights.at[2].set(0.0)              # the uncovered ray
  pts = jnp.asarray(rng.randn(v, r, s, 3).astype(np.float32) + 3.0)
  k = intrinsics_from_hwf(32, 48, 40.0)
  cams = np.stack([make_camera(32, 48, k, np.eye(4)) for _ in range(v)])
  uv = jnp.asarray(rng.rand(r, 2).astype(np.float32) * 32)
  flow = comp.render_optical_flow(weights, pts, jnp.asarray(cams), uv)
  assert np.isfinite(np.asarray(flow)).all()
