"""Roofline verdict for the eval render chunk (VERDICT r2 weak #4: "no
written roofline/bandwidth argument exists to prove the remaining
sec/frame is bound").

Uses XLA's own cost model on the ACTUAL compiled executable (lowered at the
bench shape for the current backend) to get FLOPs + HBM bytes per chunk,
measures the chunk wall time the same way bench.py does, and prints
achieved TFLOP/s vs peak, achieved GB/s vs peak, arithmetic intensity and
which roof binds.

  python scripts/roofline.py            # on the TPU
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# TPU v5e (lite) per-chip peaks: 197 TFLOP/s bf16, 819 GB/s HBM
# (public spec; jax-ml.github.io/scaling-book part 2 quotes the same).
PEAK_TFLOPS = {"bf16": 197.0, "f32": 98.5}
PEAK_HBM_GBPS = 819.0


def main():
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  from dynibar_tpu.config import RenderSettings
  from dynibar_tpu.data.ray_batch import synthetic_ff_batch
  from dynibar_tpu.models.dynibar import FFModel
  from dynibar_tpu.render.render_rays import render_rays_mv

  chunk = int(os.environ.get("DYNIBAR_BENCH_CHUNK", "1024"))
  cfg = RenderSettings(
      n_samples=64, n_importance=64, num_views_dy=7, num_views_anchor=0,
      num_views_static=11, num_vv=0, num_basis=6, inv_uniform=True,
      compute_dtype="bfloat16", strip_sampling=True, strip_impl="pallas",
      fused_aggregators=True)
  model = FFModel(cfg=cfg, num_frames=48)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      cfg, n_rays=chunk, h=288, w=512, num_frames=48, scanline=True).items()}
  coarse = (model.apply_feature(params, "feature_net", rb["src_rgbs"])[0],
            None,
            model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])[1])
  fine = (model.apply_feature(params, "feature_net_fine", rb["src_rgbs"])[0],
          None,
          model.apply_feature(params, "feature_net_fine",
                              rb["static_src_rgbs"])[1])

  def render(params, rb, coarse, fine, feedback):
    rb = dict(rb)
    rb["ray_o"] = rb["ray_o"] + feedback * 1e-12
    ret = render_rays_mv(model, params, rb, coarse, fine, cfg, det=True)
    rgb = ret["outputs_fine_ref"]["rgb"]
    return rgb, jnp.mean(rgb)

  jitted = jax.jit(render)
  lowered = jitted.lower(params, rb, coarse, fine, jnp.zeros(()))
  compiled = lowered.compile()
  try:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
      ca = ca[0]
  except Exception as e:  # noqa: BLE001
    ca = {}
    print(f"# cost_analysis unavailable: {e}")
  flops = float(ca.get("flops", float("nan")))
  bytes_accessed = float(ca.get("bytes accessed", float("nan")))

  fb = jnp.zeros(())
  out, fb = jitted(params, rb, coarse, fine, fb)
  float(fb)
  iters = 30
  t0 = time.perf_counter()
  for _ in range(iters):
    out, fb = jitted(params, rb, coarse, fine, fb)
  float(fb)
  dt = (time.perf_counter() - t0) / iters

  rays_per_sec = chunk / dt
  tflops_achieved = flops / dt / 1e12
  gbps_achieved = bytes_accessed / dt / 1e9
  intensity = flops / bytes_accessed if bytes_accessed else float("nan")
  ridge = PEAK_TFLOPS["bf16"] * 1e12 / (PEAK_HBM_GBPS * 1e9)

  result = {
      "backend": jax.default_backend(),
      "chunk": chunk,
      "sec_per_chunk": round(dt, 5),
      "rays_per_sec": round(rays_per_sec, 1),
      "hlo_gflops_per_chunk": round(flops / 1e9, 2),
      "hlo_mb_accessed_per_chunk": round(bytes_accessed / 1e6, 1),
      "gflops_per_ray": round(flops / chunk / 1e9, 4),
      "achieved_tflops": round(tflops_achieved, 2),
      "pct_bf16_peak": round(100 * tflops_achieved / PEAK_TFLOPS["bf16"], 2),
      "achieved_hbm_gbps": round(gbps_achieved, 1),
      "pct_hbm_peak": round(100 * gbps_achieved / PEAK_HBM_GBPS, 2),
      "arithmetic_intensity_flops_per_byte": round(intensity, 1),
      "ridge_point_flops_per_byte": round(ridge, 1),
      "bound": ("compute" if intensity > ridge else "memory")
               if intensity == intensity else "unknown",
  }
  print(json.dumps(result, indent=2))


if __name__ == "__main__":
  main()
