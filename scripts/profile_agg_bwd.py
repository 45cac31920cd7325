"""Per-aggregator fwd / fwd+bwd timing at the MONO train shape.

Locates where the train step's ~530 ms render backward goes: the three
aggregator calls (dynamic V=9, anchor-dynamic V=10, static V=14) each run a
Pallas primal + chunked flax-derived backward (ops/pallas_agg.attach_flax_grad)
under the production config.  This script times each call in isolation:
  * fused forward only (the primal the train step runs),
  * fwd+bwd through attach_flax_grad (the production gradient path),
  * fwd+bwd through the plain flax module (what attach_flax_grad recomputes),
and for the dynamic net also the hand-written Pallas backward
(fused_bwd_impl="pallas") for comparison.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.models.dynibar import MonoModel

R = 3072
S = 64
V_DY, V_ANCHOR, V_ST = 9, 10, 14
FEAT = 32

CFG = RenderSettings(n_samples=S, num_views_dy=V_DY,
                     num_views_anchor=V_ANCHOR, num_views_static=V_ST,
                     num_vv=3, num_basis=6, compute_dtype="bfloat16")


def timeit(name, fn, *args, iters=6):
  @jax.jit
  def chained(feedback, *a):
    a = (a[0], a[1] + feedback * 1e-12) + a[2:]  # a[0] is the param dict
    out = fn(*a)
    return jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))

  fb = chained(jnp.float32(0), *args)
  float(fb)
  t0 = time.perf_counter()
  for _ in range(iters):
    fb = chained(fb, *args)
  float(fb)
  dt = (time.perf_counter() - t0) / iters
  print(f"{name:<56s} {dt * 1e3:9.2f} ms", flush=True)
  return dt


def dy_inputs(key, v):
  ks = jax.random.split(key, 5)
  bf = jnp.bfloat16
  return (
      jax.random.normal(ks[0], (R, S, 3)),
      jax.random.normal(ks[1], (R, S, v, FEAT + 3), dtype=bf),
      jax.random.normal(ks[2], (R, 3)),
      jnp.zeros((R, S, v, 4)),
      jnp.zeros((R, S, v, 1)),
      (jax.random.uniform(ks[3], (R, S, v, 1)) > 0.2).astype(jnp.float32),
      jax.random.uniform(ks[4], (R, S, 1)),
  )


def st_inputs(key, v):
  ks = jax.random.split(key, 6)
  bf = jnp.bfloat16
  return (
      jax.random.normal(ks[0], (R, S, 3)),
      jax.random.normal(ks[1], (R, 6)),
      jax.random.normal(ks[2], (R, S, v, 6)),
      jax.random.normal(ks[3], (R, S, v, FEAT + 3), dtype=bf),
      jax.random.normal(ks[4], (R, 3)),
      jax.random.normal(ks[5], (R, S, v, 4)),
      (jax.random.uniform(ks[0], (R, S, v, 1)) > 0.2).astype(jnp.float32),
  )


def main():
  import dataclasses
  model = MonoModel(cfg=CFG, num_frames=48, remat=True)
  params = model.init_params(jax.random.PRNGKey(0))
  model_pb = dataclasses.replace(
      model, cfg=dataclasses.replace(CFG, fused_bwd_impl="pallas"))
  model_sp = dataclasses.replace(
      model, cfg=dataclasses.replace(CFG, fused_bwd_impl="pallas_split",
                                     fused_st_bwd_impl="pallas_split"))

  only = os.environ.get("DYNIBAR_AGG_BWD_PROFILE_ONLY", "")

  def grad_of(apply):
    def f(params, *args):
      # differentiate wrt params AND the array inputs, and consume every
      # grad leaf — consuming only one leaf lets XLA DCE the rest of the
      # backward and the timing collapses to the fwd
      g = jax.grad(
          lambda p, *a: jnp.sum(apply(p, *a).astype(jnp.float32)),
          argnums=tuple(range(1 + len(args))))(params, *args)
      return sum(jnp.sum(l.astype(jnp.float32))
                 for l in jax.tree_util.tree_leaves(g))
    return f

  for v, label in ((V_DY, "dy"), (V_ANCHOR, "anchor")):
    if only and only not in ("dyn", label):
      continue
    args = dy_inputs(jax.random.PRNGKey(1), v)
    timeit(f"dynamic[{label}] V={v} fused fwd", model.apply_dy_fused,
           params, *args)
    timeit(f"dynamic[{label}] V={v} fwd+bwd attach_flax_grad",
           grad_of(model.apply_dy_fused_diff), params, *args)
    timeit(f"dynamic[{label}] V={v} fwd+bwd plain flax",
           grad_of(model.apply_dy), params, *args)
    timeit(f"dynamic[{label}] V={v} fwd+bwd pallas bwd",
           grad_of(model_pb.apply_dy_fused_diff), params, *args)
    timeit(f"dynamic[{label}] V={v} fwd+bwd pallas SPLIT bwd",
           grad_of(model_sp.apply_dy_fused_diff), params, *args)

  if not only or only in ("st", "static"):
    args = st_inputs(jax.random.PRNGKey(2), V_ST)
    timeit(f"static V={V_ST} fused fwd", model.apply_st_fused,
           params, *args)
    timeit(f"static V={V_ST} fwd+bwd attach_flax_grad",
           grad_of(model.apply_st_fused_diff), params, *args)
    timeit(f"static V={V_ST} fwd+bwd plain flax",
           grad_of(model.apply_st), params, *args)
    timeit(f"static V={V_ST} fwd+bwd pallas SPLIT bwd",
           grad_of(model_sp.apply_st_fused_diff), params, *args)


if __name__ == "__main__":
  main()
