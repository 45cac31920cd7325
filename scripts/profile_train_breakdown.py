"""Component-level timing of the monocular TRAIN step on the real chip.

Decomposes the full jitted train step (feature-net encodes + render fwd +
8-term loss + backward + adam) at the reference training shape
(N_rand=3072, 64 samples, 9 dy / 10 anchor / 14 static source views @288p)
to locate the next training-perf lever.

Sync discipline: block_until_ready does not fence remote execution on this
backend; every timing materializes a scalar and threads the previous
output into the next input (DESIGN.md section 7).
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

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono
from dynibar_tpu.train import losses as losses_lib
from dynibar_tpu.train import trainer as trainer_lib

N_RAND = 3072
H, W = 288, 512


def timeit(name, fn, *args, iters=6):
  @jax.jit
  def chained(feedback, *a):
    a = (a[0] + feedback * 1e-12,) + a[1:]
    out = fn(*a)
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves[:1])

  fb = chained(jnp.float32(0), *args)
  float(fb)
  t0 = time.perf_counter()
  for _ in range(iters):
    fb = chained(fb, *args)
  float(fb)
  dt = (time.perf_counter() - t0) / iters
  print(f"{name:<52s} {dt * 1e3:9.1f} ms", flush=True)
  return dt


def main():
  config = DynibarConfig(
      N_rand=N_RAND, N_samples=64, N_importance=0, num_source_views=7,
      num_vv=3, num_basis=6, compute_dtype="bfloat16", use_remat=True)
  cfg = config.render_settings("mono")
  print(f"views: dy={cfg.num_views_dy} anchor={cfg.num_views_anchor} "
        f"static={cfg.num_views_static}  N_rand={N_RAND}  S={cfg.n_samples}")

  model = MonoModel(cfg=cfg, num_frames=48)
  rng = jax.random.PRNGKey(0)
  state, tx = trainer_lib.create_train_state(model, config, rng)
  params = state.params

  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=N_RAND, h=H, w=W, num_frames=48).items()}
  weights = losses_lib.schedule_weights(config, epoch=2)

  # --- full step (as trained, donate off so the state can be reused).
  # The returned scalar must depend on the UPDATED PARAMS, not just the
  # loss — otherwise XLA dead-code-eliminates the whole backward + adam.
  step = trainer_lib.make_train_step(model, tx, cfg, donate=False)

  def full_step(r):
    ns, metrics = step(state, dict(rb, rgb=r), weights, rng)
    touch = sum(jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(ns.params))
    return metrics["loss"] + touch * 1e-12

  t_step = timeit("FULL train step (fwd+bwd+adam)", full_step, rb["rgb"])

  # --- forward-only loss ---
  def fwd(r):
    b = dict(rb, rgb=r)
    featmaps = trainer_lib.compute_featmaps(model, params, b)
    ret = render_rays_mono(model, params, b, featmaps, cfg,
                           is_train=True, det=False, rng=rng)
    return losses_lib.compute_mono_losses(ret, b, weights)["loss"]

  timeit("forward only (featmaps+render+losses)", fwd, rb["rgb"])

  # --- feature-net encodes, fwd and fwd+bwd ---
  def feats_fwd(r):
    b = dict(rb, src_rgbs=rb["src_rgbs"] + jnp.mean(r) * 1e-12)
    fm = trainer_lib.compute_featmaps(model, params, b)
    return sum(jnp.sum(f.astype(jnp.float32)) for f in fm)

  timeit("feature-net encodes fwd (33 imgs @288p)", feats_fwd, rb["rgb"])
  timeit("feature-net encodes fwd+bwd",
         lambda r: jax.grad(
             lambda p: sum(jnp.sum(f.astype(jnp.float32))
                           for f in trainer_lib.compute_featmaps(
                               model, p, dict(rb, src_rgbs=rb["src_rgbs"]
                                              + jnp.mean(r) * 1e-12)))
         )(params)["feature_net"]["conv1"]["kernel"],
         rb["rgb"])

  # --- render core given fixed featmaps ---
  featmaps_const = jax.tree_util.tree_map(
      jax.block_until_ready, trainer_lib.compute_featmaps(model, params, rb))

  def render_fwd(r):
    b = dict(rb, rgb=r)
    ret = render_rays_mono(model, params, b, featmaps_const, cfg,
                           is_train=True, det=False, rng=rng)
    return losses_lib.compute_mono_losses(ret, b, weights)["loss"]

  timeit("render fwd (featmaps fixed)", render_fwd, rb["rgb"])

  # --- anchor (cross-time) branch cost: is_train=False drops it ---
  def render_fwd_no_anchor(r):
    b = dict(rb, rgb=r)
    ret = render_rays_mono(model, params, b, featmaps_const, cfg,
                           is_train=False, det=False, rng=rng)
    return jnp.sum(ret["outputs_coarse_ref"]["rgb"])

  timeit("render fwd WITHOUT cross-time branch", render_fwd_no_anchor,
         rb["rgb"])

  def render_bwd(r):
    def inner(p, fm):
      b = dict(rb, rgb=r)
      ret = render_rays_mono(model, p, b, fm, cfg,
                             is_train=True, det=False, rng=rng)
      return losses_lib.compute_mono_losses(ret, b, weights)["loss"]
    g = jax.grad(inner, argnums=(0, 1))(params, featmaps_const)
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(g))

  timeit("render fwd+bwd (featmaps fixed, grads wrt params+fm)",
         render_bwd, rb["rgb"])


if __name__ == "__main__":
  main()
