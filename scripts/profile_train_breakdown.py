"""Component-level timing of the monocular TRAIN step on the real chip.

Decomposes the full jitted train step (feature-net encodes + render fwd +
8-term loss + backward + adam) at the reference training shape
(N_rand=3072, 64 samples, 9 dy / 10 anchor / 14 static source views @288p)
to locate the next training-perf lever.

Sync discipline: block_until_ready does not fence remote execution on this
backend; every timing materializes a scalar and threads the previous
output into the next input (DESIGN.md section 7).

Two traps this script hit (kept as documentation):
  * the returned scalar must depend on the UPDATED PARAMS or XLA
    dead-code-eliminates the entire backward + optimizer;
  * the ray batch / train state must be TRACED ARGUMENTS — closing over
    them embeds the 288p source stacks as padded constants (576 MB each,
    68x expansion) and the full step then OOMs HBM.
"""

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
  """fn(feedback_scalar, *args) -> scalar; all operands traced args."""
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
  config = DynibarConfig(
      N_rand=N_RAND, N_samples=64, N_importance=0, num_source_views=7,
      num_vv=3, num_basis=6, compute_dtype="bfloat16", use_remat=True)
  cfg = config.render_settings("mono")
  print(f"views: dy={cfg.num_views_dy} anchor={cfg.num_views_anchor} "
        f"static={cfg.num_views_static}  N_rand={N_RAND}  S={cfg.n_samples}")

  model = MonoModel(cfg=cfg, num_frames=48, remat=config.use_remat)
  rng = jax.random.PRNGKey(0)
  state, tx = trainer_lib.create_train_state(model, config, rng)

  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=N_RAND, h=H, w=W, num_frames=48).items()}
  weights = losses_lib.schedule_weights(config, epoch=2)

  def loss_of(params, b, fm):
    ret = render_rays_mono(model, params, b, fm, cfg,
                           is_train=True, det=False, rng=rng)
    return losses_lib.compute_mono_losses(ret, b, weights)["loss"]

  def tree_touch(t):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(t))

  # --- full step (the exact trainer program, state/rb as traced args) ---
  def full_step(f, st, b):
    b = dict(b, rgb=b["rgb"] + f)

    def lf(params):
      fm = trainer_lib.compute_featmaps(model, params, b)
      return loss_of(params, b, fm)

    loss, grads = jax.value_and_grad(lf)(st.params)
    updates, _ = tx.update(grads, st.opt_state, st.params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        st.params, updates)
    return loss + tree_touch(new_params) * 1e-12

  timeit("FULL train step (fwd+bwd+adam)", full_step, state, rb)

  # --- forward-only loss ---
  def fwd(f, st, b):
    b = dict(b, rgb=b["rgb"] + f)
    fm = trainer_lib.compute_featmaps(model, st.params, b)
    return loss_of(st.params, b, fm)

  timeit("forward only (featmaps+render+losses)", fwd, state, rb)

  # --- feature-net encodes, fwd and fwd+bwd ---
  def feats_fwd(f, st, b):
    b = dict(b, src_rgbs=b["src_rgbs"] + f)
    return tree_touch(trainer_lib.compute_featmaps(model, st.params, b))

  timeit("feature-net encodes fwd (33 imgs @288p)", feats_fwd, state, rb)

  def feats_bwd(f, st, b):
    b = dict(b, src_rgbs=b["src_rgbs"] + f)
    g = jax.grad(lambda p: tree_touch(
        trainer_lib.compute_featmaps(model, p, b)))(st.params)
    return tree_touch(g)

  timeit("feature-net encodes fwd+bwd", feats_bwd, state, rb)

  # --- render core given fixed featmaps (traced args, not captured) ---
  featmaps = jax.tree_util.tree_map(
      jax.block_until_ready,
      trainer_lib.compute_featmaps(model, state.params, rb))

  def render_fwd(f, st, b, fm):
    b = dict(b, rgb=b["rgb"] + f)
    return loss_of(st.params, b, fm)

  timeit("render fwd (featmaps fixed)", render_fwd, state, rb, featmaps)

  def render_fwd_no_anchor(f, st, b, fm):
    b = dict(b, rgb=b["rgb"] + f)
    ret = render_rays_mono(model, st.params, b, fm, cfg,
                           is_train=False, det=False, rng=rng)
    return jnp.sum(ret["outputs_coarse_ref"]["rgb"]) + 0.0 * jnp.sum(f)

  timeit("render fwd WITHOUT cross-time branch", render_fwd_no_anchor,
         state, rb, featmaps)

  def render_bwd(f, st, b, fm):
    b = dict(b, rgb=b["rgb"] + f)
    g = jax.grad(loss_of, argnums=(0, 2))(st.params, b, fm)
    return tree_touch(g)

  timeit("render fwd+bwd (featmaps fixed, grads wrt params+fm)",
         render_bwd, state, rb, featmaps)


if __name__ == "__main__":
  main()
