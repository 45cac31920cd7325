"""Component-level timing of the eval render step on the real chip.

Times each sub-computation of the FF eval chunk (aggregators, ray
transformer, projection+sampling, compositing) in isolation at the bench
shape, to locate the next perf lever after the Pallas sampler.

Sync discipline: this backend's block_until_ready does not fence remote
execution; every timing materializes a scalar (see DESIGN.md §7) and
threads the previous output into the next input.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_ff_batch
from dynibar_tpu.models.dynibar import FFModel
from dynibar_tpu.render.render_rays import render_rays_mv

R = 4096          # bench chunk
S_COARSE, S_FINE = 64, 128
V_DY, V_ST = 7, 11
FEAT = 32 + 3     # rgb + featmap channels as seen by aggregators


def timeit(name, fn, *args, iters=8):
  """fn's first arg must be a float array; the previous call's output is
  folded into it so iterations chain (cannot overlap or dedupe)."""

  @jax.jit
  def chained(feedback, *a):
    a = (a[0] + feedback * 1e-12,) + a[1:]
    out = fn(*a)
    leaves = jax.tree_util.tree_leaves(out)
    return jnp.sum(leaves[0].astype(jnp.float32))

  fb = chained(jnp.float32(0), *args)
  float(fb)  # fence warmup/compile
  t0 = time.perf_counter()
  for _ in range(iters):
    fb = chained(fb, *args)
  float(fb)  # materialize -> fences the whole chain
  dt = (time.perf_counter() - t0) / iters
  print(f"{name:<42s} {dt * 1e3:9.2f} ms", flush=True)
  return dt


def main():
  cfg = RenderSettings(
      n_samples=S_COARSE, n_importance=S_FINE - S_COARSE, num_views_dy=V_DY,
      num_views_anchor=0, num_views_static=V_ST, num_vv=0, num_basis=6,
      inv_uniform=True, compute_dtype="bfloat16", strip_sampling=True,
      strip_impl="pallas")
  model = FFModel(cfg=cfg, num_frames=48)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg, n_rays=R, h=288, w=512, num_frames=48, scanline=True).items()}

  coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])[1])
  fine = (model.apply_feature(params, "feature_net_fine", rb["src_rgbs"])[0],
          None,
          model.apply_feature(params, "feature_net_fine",
                              rb["static_src_rgbs"])[1])

  def full(ray_o):
    rb2 = dict(rb)
    rb2["ray_o"] = ray_o
    ret = render_rays_mv(model, params, rb2, coarse, fine, cfg, det=True)
    return ret["outputs_fine_ref"]["rgb"]

  t_full = timeit("FULL render chunk", full, rb["ray_o"])
  print(f"{'  -> rays/s':<42s} {R / t_full:9.0f}")

  key = jax.random.PRNGKey(1)
  bf = jnp.bfloat16

  def dy_inputs(s, v):
    ks = jax.random.split(key, 6)
    return (
        jax.random.normal(ks[0], (R, s, 3)),                      # pts
        jax.random.normal(ks[1], (R, s, v, FEAT), dtype=bf),      # rgb_feat
        jax.random.normal(ks[2], (R, 3)),                         # ray dir
        jax.random.normal(ks[3], (R, s, v, 4)),                   # ray_diff
        jnp.zeros((R, s, v, 1)),                                  # time_diff
        (jax.random.uniform(ks[4], (R, s, v, 1)) > 0.1)
        .astype(jnp.float32),                                     # mask
        jnp.zeros((R, s, 1)),                                     # time
    )

  def st_inputs(s, v):
    ks = jax.random.split(key, 7)
    return (
        jax.random.normal(ks[0], (R, s, 3)),                      # pts
        jax.random.normal(ks[1], (R, 6)),                         # ref plucker
        jax.random.normal(ks[2], (R, s, v, 6)),                   # src plucker
        jax.random.normal(ks[3], (R, s, v, FEAT), dtype=bf),      # rgb_feat
        jax.random.normal(ks[4], (R, 3)),                         # ray dir
        jax.random.normal(ks[5], (R, s, v, 4)),                   # ray_diff
        (jax.random.uniform(ks[6], (R, s, v, 1)) > 0.1)
        .astype(jnp.float32),                                     # mask
    )

  t_agg = 0.0
  for s, stage in ((S_COARSE, "coarse"), (S_FINE, "fine")):
    pts, *rest = dy_inputs(s, V_DY)
    fn = functools.partial(model.apply_dy, params, stage)
    t_agg += timeit(f"DynamicAggregator S={s} V={V_DY}", fn, pts, *rest)
  for s, stage in ((S_COARSE, "coarse"), (S_FINE, "fine")):
    pts, *rest = st_inputs(s, V_ST)
    fn = functools.partial(model.apply_st, params, stage)
    t_agg += timeit(f"StaticAggregator  S={s} V={V_ST}", fn, pts, *rest)
  print(f"{'  -> aggregators total':<42s} {t_agg * 1e3:9.2f} ms"
        f"  ({100 * t_agg / t_full:.0f}% of full)")

  # ray transformer alone (inside both aggs; included above, shown for split)
  from dynibar_tpu.models.attention import RayTransformer
  rt = RayTransformer(dtype=bf)
  for s in (S_COARSE, S_FINE):
    g = jax.random.normal(key, (R, s, 128), dtype=jnp.float32)
    m = jnp.ones((R, s, 1))
    rtp = rt.init(jax.random.PRNGKey(2), g.astype(bf), g.astype(bf),
                  g.astype(bf), m)
    fn = lambda x, m: rt.apply(rtp, x.astype(bf), x.astype(bf),
                               x.astype(bf), m)
    timeit(f"RayTransformer    S={s}", fn, g, m)

  # projection + sampling alone (the coarse dy pass)
  from dynibar_tpu.core import projection as proj
  from dynibar_tpu.render.render_rays import _sampling_cast

  src_imgs, src_feats = _sampling_cast(cfg, rb["src_rgbs"], coarse[0])
  st_imgs, st_feats = _sampling_cast(cfg, rb["static_src_rgbs"], coarse[2])
  pts = jax.random.normal(key, (R, S_FINE, 3)) * 0.1
  pts_seq = jnp.broadcast_to(pts[None], (V_DY,) + pts.shape)
  pts_seq_st = jnp.broadcast_to(pts[None], (V_ST,) + pts.shape)

  @jax.jit
  def project_dy(pts, pts_seq):
    return proj.compute_with_motions(
        pts, pts_seq, rb["camera"], src_imgs, rb["src_cameras"],
        src_feats, rb["src_valid"], strip=(cfg.strip_rows, cfg.strip_cols),
        strip_impl="pallas")

  @jax.jit
  def project_st(pts, pts_seq):
    return proj.compute_with_motions(
        pts, pts_seq, rb["camera"], st_imgs, rb["static_src_cameras"],
        st_feats, rb["static_valid"], strip=(cfg.strip_rows, cfg.strip_cols),
        strip_impl="pallas")

  timeit(f"project+sample dy S={S_FINE} V={V_DY}", project_dy, pts, pts_seq)
  timeit(f"project+sample st S={S_FINE} V={V_ST}", project_st, pts,
         pts_seq_st)

  # motion mlp
  @jax.jit
  def motion_fn(pts):
    xyzt = jnp.concatenate([pts, jnp.zeros(pts.shape[:2] + (1,))], axis=-1)
    return model.apply_motion(params, "fine", xyzt)

  timeit(f"MotionMLP         S={S_FINE}", motion_fn, pts)


if __name__ == "__main__":
  main()
