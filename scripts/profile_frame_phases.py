"""Per-phase breakdown of the measured sec/frame (VERDICT r2 ask #3).

bench.py's sec_per_frame_512px covers featmap encode + one-dispatch chunked
render + host readback.  This script times each phase separately at the
same shape so DESIGN.md §2 can carry a frame-time table:

  encode      — 4 feature-net passes (coarse+fine × dy+static), fenced
  render      — render_image_ff dispatch, result left on device, fenced
                via a scalar materialization
  readback    — np.asarray of the device-resident frame outputs
  full        — the bench's one_frame() for cross-checking the sum

Sync discipline: this backend's block_until_ready does not fence remote
execution; every timing materializes a scalar (DESIGN.md §7).

  python scripts/profile_frame_phases.py        # on the TPU
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  from dynibar_tpu.config import RenderSettings
  from dynibar_tpu.data.ray_batch import synthetic_ff_batch
  from dynibar_tpu.models.dynibar import FFModel
  from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                               render_image_ff)

  h, w = 288, 512
  frame_chunk = int(os.environ.get("DYNIBAR_BENCH_FRAME_CHUNK", "4096"))
  iters = int(os.environ.get("DYNIBAR_PROFILE_ITERS", "3"))
  cfg = RenderSettings(
      n_samples=64, n_importance=64, num_views_dy=7, num_views_anchor=0,
      num_views_static=11, num_vv=0, num_basis=6, inv_uniform=True,
      compute_dtype="bfloat16", strip_sampling=True, strip_impl="pallas",
      fused_aggregators=True)
  model = FFModel(cfg=cfg, num_frames=48)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg, n_rays=frame_chunk, h=h, w=w, num_frames=48,
      scanline=True).items()}
  frame_rb = full_image_ray_batch(rb, rb["camera"])

  encode = jax.jit(lambda p, rb, fb: (
      (model.apply_feature(p, "feature_net",
                           rb["src_rgbs"] + fb * 1e-12)[0], None,
       model.apply_feature(p, "feature_net", rb["static_src_rgbs"])[1]),
      (model.apply_feature(p, "feature_net_fine", rb["src_rgbs"])[0], None,
       model.apply_feature(p, "feature_net_fine",
                           rb["static_src_rgbs"])[1])))

  def fence(tree):
    return float(sum(jnp.sum(l[..., 0].astype(jnp.float32))
                     for l in jax.tree_util.tree_leaves(tree)))

  # --- encode alone ------------------------------------------------------
  c, f = encode(params, rb, jnp.float32(0))
  fb = fence((c[0], f[0]))
  t0 = time.perf_counter()
  for _ in range(iters):
    c, f = encode(params, rb, jnp.float32(fb))
    fb = fence((c[0], f[0]))
  t_encode = (time.perf_counter() - t0) / iters

  # --- render dispatch, device-resident ---------------------------------
  # render_image_ff fuses readback into its coverage-fallback check, so
  # time the underlying one-dispatch scan program directly.
  from dynibar_tpu.render import render_image as ri
  rb_c, n_chunks, n_rays = ri._chunked_batches(frame_rb, frame_chunk, None)
  frame_fn = ri._ff_scan_fn(model, cfg, det=True)
  outs, covs = frame_fn(params, rb_c, c, f)
  fence([outs["outputs_fine_ref"]["rgb"]])
  t0 = time.perf_counter()
  for _ in range(iters):
    outs, covs = frame_fn(params, rb_c, c, f)
    fence([outs["outputs_fine_ref"]["rgb"]])
  t_render = (time.perf_counter() - t0) / iters

  # --- readback of the full output tree ---------------------------------
  t0 = time.perf_counter()
  for _ in range(iters):
    host = jax.tree_util.tree_map(np.asarray, outs)
  t_read = (time.perf_counter() - t0) / iters
  n_bytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(host))

  # --- bench's full frame for cross-check -------------------------------
  def one_frame():
    c, f = encode(params, rb, jnp.float32(0))
    o = render_image_ff(model, params, frame_rb, c, f, cfg,
                        chunk_size=frame_chunk, height=h, width=w)
    return o["outputs_fine_ref"]["rgb"]

  one_frame()
  t0 = time.perf_counter()
  for _ in range(iters):
    one_frame()
  t_full = (time.perf_counter() - t0) / iters

  print(json.dumps({
      "sec_encode": round(t_encode, 3),
      "sec_render_dispatch": round(t_render, 3),
      "sec_readback": round(t_read, 3),
      "readback_mbytes": round(n_bytes / 1e6, 1),
      "sum_phases": round(t_encode + t_render + t_read, 3),
      "sec_full_frame": round(t_full, 3),
      "frame_chunk": frame_chunk,
  }))


if __name__ == "__main__":
  main()
