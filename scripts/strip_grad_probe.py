"""Compare strip_train gradients against the default training path.

Same params, same batch, same rng: gradient per parameter group under
(a) the default exact-gather training program and (b) strip_train
(Pallas windowed primal + gather-VJP backward).  The coverage probe
(strip_coverage_probe.py) showed 100% window coverage on the convergence
scene, so if tpu3kstrip's flat learning curve came from the sampler, the
difference must be visible directly in the gradients.

Usage: JAX_PLATFORMS=cpu python scripts/strip_grad_probe.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.data.monocular import MonocularSceneData
from dynibar_tpu.data.synthetic_scene import ConsistentScene
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.train.losses import schedule_weights
from dynibar_tpu.train.trainer import create_train_state, make_mono_loss_fn


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--dtype", default="bfloat16")
  ap.add_argument("--n_rand", type=int, default=512)
  ap.add_argument("--n_samples", type=int, default=32)
  args = ap.parse_args()

  frames, height, width = 24, 96, 144
  scene = ConsistentScene(num_frames=frames, height=height, width=width)
  root = os.path.join("/tmp/dynibar_convergence",
                      f"scene_{frames}x{height}x{width}")
  name = "consistent"
  if not os.path.exists(os.path.join(root, name, "dense",
                                     "poses_bounds_cvd.npy")):
    os.makedirs(root, exist_ok=True)
    scene.write(root, name)

  common = dict(
      folder_path=root, train_scenes=[name], training_height=height,
      N_rand=args.n_rand, N_samples=args.n_samples, N_importance=0,
      num_source_views=7, num_vv=3, num_basis=6, max_range=24,
      init_decay_epoch=40, compute_dtype=args.dtype,
      use_remat=False, fused_aggregators=True)
  cfg_def = DynibarConfig(**common)
  cfg_strip = DynibarConfig(strip_sampling=True, strip_train=True,
                            coherent_ray_segment=16, **common)

  # coherent batch (what strip_train trains on) — fed to BOTH paths so the
  # only difference is the sampler program
  data = MonocularSceneData(cfg_strip, name)
  data.set_epoch(2)
  rb = data.sample_batch(np.random.RandomState(0), args.n_rand,
                         cfg_strip.sample_mode)
  rb = {k: jnp.asarray(v) for k, v in rb.items()}

  model_def = MonoModel(cfg=cfg_def.render_settings("mono"),
                        num_frames=frames)
  model_strip = MonoModel(cfg=cfg_strip.render_settings("mono"),
                          num_frames=frames)
  state, _ = create_train_state(model_def, cfg_def, jax.random.PRNGKey(0))
  weights = schedule_weights(cfg_def, epoch=2)
  rng = jax.random.PRNGKey(7)

  out = {}
  for tag, model, config in (("default", model_def, cfg_def),
                             ("strip", model_strip, cfg_strip)):
    loss_fn = make_mono_loss_fn(model, config.render_settings("mono"))
    (loss, metrics), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(state.params, rb, weights, rng)
    out[tag] = (float(loss), metrics, grads)
    print(f"{tag:8s} loss={float(loss):.6f} "
          + " ".join(f"{k}={float(v):.4f}" for k, v in sorted(
              metrics.items()) if np.ndim(v) == 0 and k != "loss"))

  g_def, g_strip = out["default"][2], out["strip"][2]
  print(f"\n{'group':16s} {'|g_default|':>12s} {'|g_strip|':>12s} "
        f"{'rel-diff':>10s}")
  for k in sorted(g_def):
    nd = np.sqrt(sum(float(jnp.sum(jnp.square(x.astype(jnp.float32))))
                     for x in jax.tree_util.tree_leaves(g_def[k])))
    ns = np.sqrt(sum(float(jnp.sum(jnp.square(x.astype(jnp.float32))))
                     for x in jax.tree_util.tree_leaves(g_strip[k])))
    dd = np.sqrt(sum(
        float(jnp.sum(jnp.square(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))
        for a, b in zip(jax.tree_util.tree_leaves(g_def[k]),
                        jax.tree_util.tree_leaves(g_strip[k]))))
    print(f"{k:16s} {nd:12.5g} {ns:12.5g} {dd / max(nd, 1e-12):10.3g}")


if __name__ == "__main__":
  main()
