"""Decompose the render core's BACKWARD beyond the aggregators.

profile_agg_bwd.py puts the three aggregator fwd+bwds at ~285 ms; the full
render fwd+bwd is ~885 ms with a 354 ms forward.  This script locates the
other ~250 ms: it times the full render fwd+bwd against a variant whose
aggregator outputs are stop_gradient'd (removing exactly the aggregator
backwards from the autodiff program), plus isolated fwd+bwd of the motion
MLP and one projector/sampling call at the training shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.core import projection as proj
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono
from dynibar_tpu.train import losses as losses_lib
from dynibar_tpu.train import trainer as trainer_lib

N_RAND = 3072
H, W = 288, 512


def timeit(name, fn, *args, iters=6):
  jfn = jax.jit(fn)
  fb = jfn(jnp.float32(0), *args)
  float(fb)
  t0 = time.perf_counter()
  for _ in range(iters):
    fb = jfn(fb * 1e-12, *args)
  float(fb)
  dt = (time.perf_counter() - t0) / iters
  print(f"{name:<56s} {dt * 1e3:9.1f} ms", flush=True)
  return dt


def main():
  config = DynibarConfig(
      N_rand=N_RAND, N_samples=64, N_importance=0, num_source_views=7,
      num_vv=3, num_basis=6, compute_dtype="bfloat16", use_remat=True)
  cfg = config.render_settings("mono")
  model = MonoModel(cfg=cfg, num_frames=48, remat=config.use_remat)
  rng = jax.random.PRNGKey(0)
  state, tx = trainer_lib.create_train_state(model, config, rng)
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=N_RAND, h=H, w=W, num_frames=48).items()}
  weights = losses_lib.schedule_weights(config, epoch=2)
  featmaps = jax.tree_util.tree_map(
      jax.block_until_ready,
      trainer_lib.compute_featmaps(model, state.params, rb))

  def tree_touch(t):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(t))

  def loss_of(mdl, params, b, fm):
    ret = render_rays_mono(mdl, params, b, fm, cfg,
                           is_train=True, det=False, rng=rng)
    return losses_lib.compute_mono_losses(ret, b, weights)["loss"]

  def render_bwd(f, st, b, fm):
    b = dict(b, rgb=b["rgb"] + f)
    g = jax.grad(loss_of, argnums=(1, 3))(model, st.params, b, fm)
    return tree_touch(g)

  timeit("render fwd+bwd (featmaps fixed)", render_bwd, state, rb, featmaps)

  # ---- same, aggregator outputs stop_gradient'd ----
  sg = jax.lax.stop_gradient

  class _NoAggGrad(MonoModel):
    def apply_dy_fused_diff(self, params, *args):
      return self.apply_dy_fused(sg(params), *(sg(a) for a in args))

    def apply_st_fused_diff(self, params, *args):
      return self.apply_st_fused(sg(params), *(sg(a) for a in args))

  model_na = _NoAggGrad(cfg=cfg, num_frames=48, remat=config.use_remat)

  def render_bwd_noagg(f, st, b, fm):
    b = dict(b, rgb=b["rgb"] + f)
    g = jax.grad(loss_of, argnums=(1, 3))(model_na, st.params, b, fm)
    return tree_touch(g)

  timeit("render fwd+bwd, aggregator grads ABLATED", render_bwd_noagg,
         state, rb, featmaps)

  # ---- motion MLP fwd+bwd at the training point count (x2 calls) ----
  xyzt = jax.random.normal(jax.random.PRNGKey(1), (N_RAND, 64, 4))

  def motion_bwd(f, st, x):
    x = x + f
    g = jax.grad(lambda p, xx: jnp.sum(
        model.apply_motion(p, xx).astype(jnp.float32)),
        argnums=(0, 1))(st.params, x)
    return tree_touch(g)

  timeit("motion MLP fwd+bwd (one of 2 calls)", motion_bwd, state, xyzt)

  # ---- one projector + sampling call fwd+bwd (dynamic: V=9) ----
  v = cfg.num_views_dy
  pts = jax.random.normal(jax.random.PRNGKey(2), (N_RAND, 64, 3))
  pts_seq = jnp.broadcast_to(pts[None], (v,) + pts.shape)
  src_imgs = rb["src_rgbs"].astype(jnp.bfloat16)
  src_feats = featmaps[0].astype(jnp.bfloat16)

  def proj_bwd(f, p, fm):
    p = p + f
    def pf(pp, ff):
      rgb_feat, ray_diff, mask = proj.compute_with_motions(
          pp, jnp.broadcast_to(pp[None], (v,) + pp.shape), rb["camera"],
          src_imgs, rb["src_cameras"], ff, rb["src_valid"])
      return (jnp.sum(rgb_feat.astype(jnp.float32))
              + jnp.sum(ray_diff.astype(jnp.float32)))
    g = jax.grad(pf, argnums=(0, 1))(p, fm)
    return tree_touch(g)

  timeit("projector+sampler fwd+bwd (V=9 dynamic call)", proj_bwd,
         pts, src_feats)


if __name__ == "__main__":
  main()
