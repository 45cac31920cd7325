"""Time the fused Pallas aggregators vs the flax modules on the real chip."""

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
from dynibar_tpu.models.dynibar import FFModel
from dynibar_tpu.ops.pallas_agg import (fused_dynamic_aggregator,
                                        fused_static_aggregator)

R = 4096
V_DY, V_ST = 7, 11
FEAT = 35


def timeit(name, fn, *args, iters=8):
  @jax.jit
  def chained(feedback, *a):
    a = (a[0] + feedback * 1e-12,) + a[1:]
    out = fn(*a)
    return jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))

  fb = chained(jnp.float32(0), *args)
  float(fb)
  t0 = time.perf_counter()
  for _ in range(iters):
    fb = chained(fb, *args)
  float(fb)
  dt = (time.perf_counter() - t0) / iters
  print(f"{name:<44s} {dt * 1e3:9.2f} ms", flush=True)
  return dt


def main():
  cfg = RenderSettings(
      n_samples=64, n_importance=64, num_views_dy=V_DY, num_views_anchor=0,
      num_views_static=V_ST, num_vv=0, num_basis=6, inv_uniform=True,
      compute_dtype="bfloat16")
  model = FFModel(cfg=cfg, num_frames=48)
  params = model.init_params(jax.random.PRNGKey(0))
  key = jax.random.PRNGKey(1)
  bf = jnp.bfloat16

  def dy_inputs(s, v):
    ks = jax.random.split(key, 6)
    return (
        jax.random.normal(ks[0], (R, s, 3)),
        jax.random.normal(ks[1], (R, s, v, FEAT), dtype=bf),
        jax.random.normal(ks[2], (R, 3)),
        jax.random.normal(ks[3], (R, s, v, 4)),
        jnp.zeros((R, s, v, 1)),
        (jax.random.uniform(ks[4], (R, s, v, 1)) > 0.1).astype(jnp.float32),
        jnp.zeros((R, s, 1)),
    )

  def st_inputs(s, v):
    ks = jax.random.split(key, 7)
    return (
        jax.random.normal(ks[0], (R, s, 3)),
        jax.random.normal(ks[1], (R, 6)),
        jax.random.normal(ks[2], (R, s, v, 6)),
        jax.random.normal(ks[3], (R, s, v, FEAT), dtype=bf),
        jax.random.normal(ks[4], (R, 3)),
        jax.random.normal(ks[5], (R, s, v, 4)),
        (jax.random.uniform(ks[6], (R, s, v, 1)) > 0.1).astype(jnp.float32),
    )

  for s, stage in ((64, "coarse"), (128, "fine")):
    args = dy_inputs(s, V_DY)
    flax_fn = functools.partial(model.apply_dy, params, stage)
    t_flax = timeit(f"flax  DynamicAggregator S={s} V={V_DY}", flax_fn, *args)
    p = params[f"net_{stage}_dy"]
    fused_fn = functools.partial(fused_dynamic_aggregator, p, shift=0.0,
                                 n_samples=s)
    t_fused = timeit(f"FUSED DynamicAggregator S={s} V={V_DY}", fused_fn,
                     *args)
    ref = np.asarray(flax_fn(*args), np.float32)
    got = np.asarray(fused_fn(*args), np.float32)
    print(f"   speedup {t_flax / t_fused:5.2f}x   "
          f"maxdiff {np.abs(ref - got).max():.4f}")

  for s, stage in ((64, "coarse"), (128, "fine")):
    args = st_inputs(s, V_ST)
    flax_fn = functools.partial(model.apply_st, params, stage)
    t_flax = timeit(f"flax  StaticAggregator  S={s} V={V_ST}", flax_fn, *args)
    p = params[f"net_{stage}_st"]
    fused_fn = functools.partial(fused_static_aggregator, p,
                                 anti_alias_pooling=True, mask_rgb=True)
    t_fused = timeit(f"FUSED StaticAggregator  S={s} V={V_ST}", fused_fn,
                     *args)
    ref = np.asarray(flax_fn(*args), np.float32)
    got = np.asarray(fused_fn(*args), np.float32)
    print(f"   speedup {t_flax / t_fused:5.2f}x   "
          f"maxdiff {np.abs(ref - got).max():.4f}")


if __name__ == "__main__":
  main()
