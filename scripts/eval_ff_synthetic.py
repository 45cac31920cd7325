"""Run the FULL Nvidia-benchmark eval protocol on a trained FF checkpoint.

The real benchmark data is env-blocked, but the round-4 FF convergence
run produced a trained DynibarFF on the analytic Nvidia-layout scene —
so the complete eval machinery (eval/nvidia_eval.evaluate_scene: frames
3..N-3 x 11 round-robin viewpoints, masked full/dynamic/static PSNR +
SSIM + LPIPS accumulators, valid-mask protocol of reference
eval_nvidia.py:305-481) can be driven end to end with a model that
actually renders the scene, not random weights.  This is the closest
possible stand-in for the env-blocked released-checkpoint eval: every
line of the eval path runs for real; only the pixels are synthetic.

It also prices the advertised speed modes in dB (VERDICT r4 ask #2): the
``--mode`` ladder isolates one lever per rung, so every throughput number
in DESIGN.md §2 / README gets a measured PSNR/SSIM delta on a TRAINED
model at real shapes (protocol matched: reference eval_nvidia.py:383-457).

  exact_f32   f32, flax aggregators, exact per-point gather   (gold)
  exact_bf16  + bf16 compute                                  (prices bf16)
  fused_bf16  + fused Pallas aggregators                      (prices kernels)
  production  + Pallas strip sampler + channel-major handoff  (the 17.4k mode)
  fused_rgb   + featmap-resolution RGB lookup                 (the 21.3k mode)

Usage:
  python scripts/eval_ff_synthetic.py \
      [--ckpt /tmp/dynibar_ff_convergence/ckpt_fftpu_B] [--frames N] \
      [--mode production]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--ckpt",
                  default="/tmp/dynibar_ff_convergence/ckpt_fftpu_B")
  ap.add_argument("--root",
                  default="/tmp/dynibar_ff_convergence/scene_48x96x144")
  ap.add_argument("--scene", default="consistent_nvidia")
  ap.add_argument("--height", type=int, default=96)
  ap.add_argument("--frames", type=int, default=0,
                  help="limit to the first N eval frames (0 = protocol "
                       "full range 3..N-3)")
  ap.add_argument("--mode", default="fused_bf16",
                  choices=["exact_f32", "exact_bf16", "fused_bf16",
                           "production", "fused_rgb"],
                  help="speed-mode ladder (see module docstring); default "
                       "matches the round-4 BASELINE.md table")
  args = ap.parse_args()

  mode_kw = {
      # chunk 2304: the f32 flax render at chunk 4608 exceeds one v5e
      # chip's HBM by 17 MB (measured 15.76G vs 15.75G; a padded f32
      # buffer takes a 4.0x expansion) — halving the ray chunk clears it
      "exact_f32": dict(compute_dtype="float32", fused_aggregators=False,
                        strip_sampling=False, fused_rgb_sampling=False,
                        chunk_size=2304),
      "exact_bf16": dict(compute_dtype="bfloat16", fused_aggregators=False,
                         strip_sampling=False, fused_rgb_sampling=False),
      "fused_bf16": dict(compute_dtype="bfloat16", fused_aggregators=True,
                         strip_sampling=False, fused_rgb_sampling=False),
      "production": dict(compute_dtype="bfloat16", fused_aggregators=True,
                         strip_sampling=True, fused_rgb_sampling=False),
      "fused_rgb": dict(compute_dtype="bfloat16", fused_aggregators=True,
                        strip_sampling=True, fused_rgb_sampling=True),
  }[args.mode]

  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  import jax
  from dynibar_tpu.config import DynibarConfig
  from dynibar_tpu.eval.nvidia_eval import evaluate_scene
  from dynibar_tpu.models.dynibar import FFModel
  from dynibar_tpu.utils.checkpoints import latest_checkpoint, load_checkpoint

  config = DynibarConfig(
      folder_path=args.root, eval_scenes=[args.scene],
      training_height=args.height, N_samples=64, N_importance=64,
      num_source_views=7, num_basis=6, mask_static=False,
      chunk_size=mode_kw.pop("chunk_size", 4608), **mode_kw)
  cfg = config.render_settings("ff")
  model = FFModel(cfg=cfg, num_frames=48)

  path = latest_checkpoint(args.ckpt)
  if path is None:
    raise SystemExit(f"no checkpoint under {args.ckpt}")
  params = load_checkpoint(path)["params"]
  print(f"backend={jax.default_backend()} ckpt={path}")

  frame_range = range(3, 3 + args.frames) if args.frames else None
  t0 = time.time()
  tables = evaluate_scene(config, model, params, args.scene,
                          frame_range=frame_range)
  dt = time.time() - t0
  print(json.dumps({"scene": args.scene, "mode": args.mode,
                    "eval_seconds": round(dt, 1),
                    **{k: {m: round(v, 4) for m, v in t.items()}
                       for k, t in tables.items()}}))


if __name__ == "__main__":
  main()
