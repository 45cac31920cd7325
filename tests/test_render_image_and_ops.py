"""Full-image chunked rendering, softmax splatting, LPIPS shape tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                             render_image_mono)
from dynibar_tpu.ops.splat import softmax_splat


CFG = RenderSettings(n_samples=8, num_views_dy=9, num_views_anchor=10,
                     num_views_static=6, num_vv=3, num_basis=4)


def test_render_image_mono_chunked_padding():
  h, w = 12, 16
  model = MonoModel(cfg=CFG, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb_t = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      CFG, n_rays=8, h=h, w=w, num_frames=32).items()}
  rb = full_image_ray_batch(rb_t, rb_t["camera"])
  assert rb["ray_o"].shape == (h * w, 3)
  assert "rgb" not in rb  # supervision stripped

  dy, _ = model.apply_feature(params, rb["src_rgbs"])
  st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
  # chunk_size 100 does not divide 192 -> exercises the pad path
  ret = render_image_mono(model, params, rb, (dy, None, st), CFG,
                          chunk_size=100, height=h, width=w)
  img = ret["outputs_coarse_ref"]["rgb"]
  assert img.shape == (h, w, 3)
  assert np.isfinite(img).all()
  # chunking must not change values: render again with a different chunk
  ret2 = render_image_mono(model, params, rb, (dy, None, st), CFG,
                           chunk_size=64, height=h, width=w)
  np.testing.assert_allclose(img, ret2["outputs_coarse_ref"]["rgb"],
                             atol=1e-5)
  st_img = ret["outputs_coarse_st"]["rgb"]
  assert st_img.shape == (h, w, 3)


def test_softmax_splat_identity_and_shift():
  rng = np.random.RandomState(0)
  img = rng.rand(8, 10, 3).astype(np.float32)
  imp = np.zeros((8, 10), np.float32)
  zero_flow = np.zeros((8, 10, 2), np.float32)
  out = np.asarray(softmax_splat(jnp.asarray(img), jnp.asarray(zero_flow),
                                 jnp.asarray(imp)))
  np.testing.assert_allclose(out, img, atol=1e-5)

  # integer shift by +2 in x moves content exactly
  flow = np.zeros((8, 10, 2), np.float32)
  flow[..., 0] = 2.0
  out = np.asarray(softmax_splat(jnp.asarray(img), jnp.asarray(flow),
                                 jnp.asarray(imp)))
  np.testing.assert_allclose(out[:, 2:], img[:, :-2], atol=1e-5)
  np.testing.assert_allclose(out[:, :2], 0.0, atol=1e-6)


def test_softmax_splat_occlusion_prefers_high_importance():
  # two rows collapse onto one target row; the high-importance one wins
  img = np.zeros((4, 4, 1), np.float32)
  img[1] = 1.0   # foreground value 1
  img[2] = 0.0   # background value 0
  flow = np.zeros((4, 4, 2), np.float32)
  flow[2, :, 1] = -1.0  # row 2 -> row 1
  imp = np.zeros((4, 4), np.float32)
  imp[1] = 20.0  # foreground much more important
  out = np.asarray(softmax_splat(jnp.asarray(img), jnp.asarray(flow),
                                 jnp.asarray(imp)))
  assert out[1].min() > 0.99  # foreground survives the collision


def test_lpips_net_shapes_with_random_weights():
  from dynibar_tpu.eval.lpips import LPIPSNet
  net = LPIPSNet()
  a = jnp.zeros((1, 64, 64, 3))
  b = jnp.ones((1, 64, 64, 3)) * 0.1
  params = net.init(jax.random.PRNGKey(0), a, b)["params"]
  out = net.apply({"params": params}, a, b)
  assert out.shape == (1,)
  m = jnp.ones((1, 64, 64, 1))
  out_m = net.apply({"params": params}, a, b, m)
  assert np.isfinite(np.asarray(out_m)).all()


def test_distortion_loss_zero_for_delta_weights():
  """A single-sample spike has zero pairwise term; self term small."""
  from dynibar_tpu.ops.distortion import eff_distloss
  w = np.zeros((2, 16), np.float32)
  w[:, 5] = 1.0
  m = np.linspace(0, 1, 16, dtype=np.float32)[None].repeat(2, 0)
  iv = np.full((2, 16), 1.0 / 16, np.float32)
  val = float(eff_distloss(jnp.asarray(w), jnp.asarray(m), jnp.asarray(iv)))
  assert val == pytest.approx(1.0 / 48, rel=1e-4)  # w²·iv/3 only
