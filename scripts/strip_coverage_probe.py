"""Diagnose strip_train's convergence failure: measure window coverage.

The tpu3kstrip convergence run (+0.12 dB vs +4.62 default, CONVERGENCE.md)
opted training into the Pallas windowed sampler, whose uncovered samples
are *masked out of the aggregation* (core/projection.py: mask &= covered).
In eval, render_image re-renders uncovered chunks exactly; in TRAINING
there is no fallback — uncovered samples silently lose their supervision.

This probe measures, on the exact tpu3kstrip configuration (ConsistentScene
96x144, N_rand=3072, S=64, coherent_ray_segment=16), the fraction of
otherwise-valid (in-bounds, in-front) samples the window covers, for:
  * the featmap gather (1/4-res maps) and the full-res RGB gather,
  * the dynamic and static view stacks,
  * the kernel's auto group size (32 rays at S=64 — which SPANS TWO
    unrelated 16-ray segments) vs group=16 (one window per segment).

Usage: JAX_PLATFORMS=cpu python scripts/strip_coverage_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.core import cameras as cam
from dynibar_tpu.core import sampling
from dynibar_tpu.core.projection import project_points, inbound_mask
from dynibar_tpu.data.monocular import MonocularSceneData
from dynibar_tpu.data.synthetic_scene import ConsistentScene
from dynibar_tpu.ops.pallas_sample import window_prep


def coverage(grid, mask, h, w, group, blk, dtype=jnp.bfloat16):
  """Fraction of mask-valid samples covered by the (group, blk) window."""
  prep = window_prep(jnp.asarray(grid), h, w, dtype, group=group, blk=blk)
  cov = np.asarray(prep["covered"])[:, :grid.shape[1]]
  m = np.asarray(mask)
  tot = m.sum()
  return float((cov & m).sum() / max(tot, 1)), prep["group"], prep["blk"]


def main():
  frames, height, width = 24, 96, 144
  scene = ConsistentScene(num_frames=frames, height=height, width=width)
  root = os.path.join("/tmp/dynibar_convergence",
                      f"scene_{frames}x{height}x{width}")
  name = "consistent"
  if not os.path.exists(os.path.join(root, name, "dense",
                                     "poses_bounds_cvd.npy")):
    os.makedirs(root, exist_ok=True)
    scene.write(root, name)

  config = DynibarConfig(
      folder_path=root, train_scenes=[name], training_height=height,
      N_rand=3072, N_samples=64, N_importance=0, num_source_views=7,
      num_vv=3, num_basis=6, max_range=24, init_decay_epoch=40,
      compute_dtype="bfloat16", strip_sampling=True, strip_train=True,
      coherent_ray_segment=16)
  data = MonocularSceneData(config, name)
  data.set_epoch(2)
  rng = np.random.RandomState(0)
  rb = data.sample_batch(rng, config.N_rand, config.sample_mode)
  rb = {k: jnp.asarray(v) for k, v in rb.items()}

  key = jax.random.PRNGKey(0)
  pts, _, _ = sampling.sample_along_ray(
      rb["ray_o"], rb["ray_d"], rb["depth_range"], config.N_samples,
      inv_uniform=False, det=False, rng=key)

  for label, cams_key, imgs_key in (
      ("dynamic", "src_cameras", "src_rgbs"),
      ("static", "static_src_cameras", "static_src_rgbs")):
    cams = rb[cams_key]
    v = cams.shape[0]
    xyz = jnp.broadcast_to(pts[None], (v,) + pts.shape)
    pix, in_front = project_points(xyz, cams)
    h_img = float(cams[0, 0])
    w_img = float(cams[0, 1])
    mask = np.asarray(inbound_mask(pix, h_img, w_img) & in_front)
    resize = jnp.stack([w_img - 1.0, h_img - 1.0])
    grid = 2.0 * pix / resize - 1.0

    hf, wf = int(h_img) // 4, int(w_img) // 4
    print(f"--- {label}: views={v} img={int(h_img)}x{int(w_img)} "
          f"featmap={hf}x{wf} valid_frac={mask.mean():.3f}")
    for tag, hh in (("featmap", hf), ("rgb", int(h_img))):
      for group in (0, 16, 8):
        frac, g, b = coverage(grid, mask, hh, wf if tag == "featmap"
                              else int(w_img), group, 0)
        print(f"  {tag:8s} group={g:3d} blk={b:3d}: covered "
              f"{100 * frac:6.2f}% of valid samples")


if __name__ == "__main__":
  main()
