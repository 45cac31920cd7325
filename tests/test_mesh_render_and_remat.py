"""Mesh-sharded full-image rendering + remat equivalence tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynibar_tpu.config import DynibarConfig, RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.parallel.mesh import make_mesh
from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                             render_image_mono)

CFG = RenderSettings(n_samples=8, num_views_dy=9, num_views_anchor=10,
                     num_views_static=6, num_vv=3, num_basis=4)
H, W = 12, 16


@pytest.fixture(scope="module")
def setup():
  model = MonoModel(cfg=CFG, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb_t = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      CFG, n_rays=8, h=H, w=W, num_frames=32).items()}
  rb = full_image_ray_batch(rb_t, rb_t["camera"])
  dy, _ = model.apply_feature(params, rb["src_rgbs"])
  st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
  return model, params, rb, (dy, None, st)


def test_mesh_sharded_render_matches_single_device(setup):
  model, params, rb, featmaps = setup
  single = render_image_mono(model, params, rb, featmaps, CFG,
                             chunk_size=64, height=H, width=W)
  mesh = make_mesh(jax.devices()[:8])
  sharded = render_image_mono(model, params, rb, featmaps, CFG,
                              chunk_size=64, height=H, width=W, mesh=mesh)
  np.testing.assert_allclose(sharded["outputs_coarse_ref"]["rgb"],
                             single["outputs_coarse_ref"]["rgb"], atol=1e-5)
  np.testing.assert_allclose(sharded["outputs_coarse_ref"]["depth"],
                             single["outputs_coarse_ref"]["depth"],
                             atol=1e-4)


def test_scan_chunks_matches_per_chunk_dispatch(setup):
  """The one-dispatch lax.map frame render must be bit-identical to the
  per-chunk jit loop."""
  model, params, rb, featmaps = setup
  scan = render_image_mono(model, params, rb, featmaps, CFG,
                           chunk_size=64, height=H, width=W,
                           scan_chunks=True)
  loop = render_image_mono(model, params, rb, featmaps, CFG,
                           chunk_size=64, height=H, width=W,
                           scan_chunks=False)
  for fam in scan:
    for key in scan[fam]:
      np.testing.assert_allclose(scan[fam][key], loop[fam][key], atol=1e-6,
                                 err_msg=f"{fam}/{key}")


def test_mesh_many_chunk_frame_render_both_paths(setup):
  """Regression for the round-3 XLA:CPU collective-rendezvous SIGABRT: a
  many-chunk frame on the 8-device mesh.  The per-chunk dispatch loop used
  to keep several executions of the sharded chunk program in flight at
  once; devices could split between different executions' collectives and
  the rendezvous timeout aborted the process.  Both mesh paths (one-dispatch
  lax.map scan — the default — and the serialized per-chunk loop) must
  complete and match the single-device render."""
  model, params, rb, featmaps = setup
  mesh = make_mesh(jax.devices()[:8])
  single = render_image_mono(model, params, rb, featmaps, CFG,
                             chunk_size=16, height=H, width=W)
  # 12*16=192 rays / chunk 16 -> 12 chunks (the crash shape's chunk count)
  scan = render_image_mono(model, params, rb, featmaps, CFG,
                           chunk_size=16, height=H, width=W, mesh=mesh,
                           scan_chunks=True)
  loop = render_image_mono(model, params, rb, featmaps, CFG,
                           chunk_size=16, height=H, width=W, mesh=mesh,
                           scan_chunks=False)
  for out in (scan, loop):
    np.testing.assert_allclose(out["outputs_coarse_ref"]["rgb"],
                               single["outputs_coarse_ref"]["rgb"],
                               atol=1e-5)


def test_mesh_chunk_size_must_divide(setup):
  model, params, rb, featmaps = setup
  mesh = make_mesh(jax.devices()[:8])
  with pytest.raises(AssertionError):
    render_image_mono(model, params, rb, featmaps, CFG,
                      chunk_size=50, height=H, width=W, mesh=mesh)


def test_remat_gradients_match(setup):
  """jax.checkpoint must not change gradients, only memory."""
  from dynibar_tpu.data.ray_batch import synthetic_mono_batch
  from dynibar_tpu.render.render_rays import render_rays_mono

  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      CFG, n_rays=8, h=H, w=W, num_frames=32).items()}

  def loss_for(model):
    def loss(params):
      dy, _ = model.apply_feature(params, rb["src_rgbs"])
      anchor, _ = model.apply_feature(params, rb["anchor_src_rgbs"])
      st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
      ret = render_rays_mono(model, params, rb, (dy, anchor, st), CFG,
                             is_train=False, det=True)
      return jnp.mean((ret["outputs_coarse_ref"]["rgb"] - rb["rgb"]) ** 2)
    return loss

  base = MonoModel(cfg=CFG, num_frames=32, remat=False)
  rem = MonoModel(cfg=CFG, num_frames=32, remat=True)
  params = base.init_params(jax.random.PRNGKey(0))

  g1 = jax.jit(jax.grad(loss_for(base)))(params)
  g2 = jax.jit(jax.grad(loss_for(rem)))(params)
  chex = __import__("chex")
  chex.assert_trees_all_close(g1, g2, atol=1e-6)
