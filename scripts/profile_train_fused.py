"""Full train step: flax aggregators vs fused-primal (custom-VJP) mode."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynibar_tpu.config import DynibarConfig
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
  print(f"{name:<52s} {dt * 1e3:9.1f} ms", flush=True)
  return dt


def main():
  rng = jax.random.PRNGKey(0)
  results = {}
  # (fused_train, dynamic bwd, static bwd)
  configs = ((False, "flax", "flax"), (True, "flax", "flax"),
             (True, "pallas", "flax"), (True, "pallas_split", "flax"),
             (True, "pallas_split", "pallas_split"))
  if os.environ.get("DYNIBAR_TRAIN_PROFILE_ONLY"):
    wanted = os.environ["DYNIBAR_TRAIN_PROFILE_ONLY"]
    configs = tuple(c for c in configs if c[1] == wanted and c[0])
  for fused_train, bwd, st_bwd in configs:
    config = DynibarConfig(
        N_rand=N_RAND, N_samples=64, N_importance=0, num_source_views=7,
        num_vv=3, num_basis=6, compute_dtype="bfloat16", use_remat=True,
        fused_aggregators=True, fused_aggregators_train=fused_train,
        fused_bwd_impl=bwd, fused_st_bwd_impl=st_bwd)
    cfg = config.render_settings("mono")
    model = MonoModel(cfg=cfg, num_frames=48, remat=True)
    state, tx = trainer_lib.create_train_state(model, config, rng)
    rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
        cfg, n_rays=N_RAND, h=H, w=W, num_frames=48).items()}
    weights = losses_lib.schedule_weights(config, epoch=2)

    def full_step(f, st, b):
      b = dict(b, rgb=b["rgb"] + f)

      def lf(params):
        fm = trainer_lib.compute_featmaps(model, params, b)
        ret = render_rays_mono(model, params, b, fm, cfg,
                               is_train=True, det=False, rng=rng)
        return losses_lib.compute_mono_losses(ret, b, weights)["loss"]

      loss, grads = jax.value_and_grad(lf)(st.params)
      updates, _ = tx.update(grads, st.opt_state, st.params)
      new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                          st.params, updates)
      touch = sum(jnp.sum(l.astype(jnp.float32))
                  for l in jax.tree_util.tree_leaves(new_params))
      return loss + touch * 1e-12

    label = ("flax aggregators" if not fused_train
             else f"fused-primal, {bwd} dyn / {st_bwd} st bwd")
    results[(fused_train, bwd, st_bwd)] = timeit(f"train step [{label}]",
                                                 full_step, state, rb)
  if (False, "flax", "flax") in results:
    base = results[(False, "flax", "flax")]
    for k, dt in results.items():
      print(f"{k}: {base / dt:.2f}x vs flax")


if __name__ == "__main__":
  main()
