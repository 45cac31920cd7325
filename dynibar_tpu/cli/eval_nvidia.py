"""Nvidia benchmark eval CLI.

Rebuild of the reference eval entry point (eval_nvidia.py:266-481).

Usage:
  python -m dynibar_tpu.cli.eval_nvidia --config configs_nvidia/eval_x.txt \
      [--coarse_ckpt path.pth --fine_ckpt path.pth]  # torch checkpoints
"""

from __future__ import annotations

import argparse
import json

import jax

from dynibar_tpu.cli.train import parse_args as parse_config_args
from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.eval.nvidia_eval import evaluate_scene
from dynibar_tpu.models.dynibar import FFModel
from dynibar_tpu.utils import checkpoints as ckpt_lib


def main():
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  ap = argparse.ArgumentParser(add_help=False)
  ap.add_argument("--coarse_ckpt", type=str, default="")
  ap.add_argument("--fine_ckpt", type=str, default="")
  ap.add_argument("--lpips_weights_dir", type=str, default="")
  ap.add_argument("--results_json", type=str, default="")
  ap.add_argument("--max_frames", type=int, default=0,
                  help="evaluate only the first N frames (0 = all)")
  known, _ = ap.parse_known_args()
  config = parse_config_args()

  if not config.eval_scenes:
    raise SystemExit("error: no eval scene — pass --eval_scenes <scene...> "
                     "or a --config with `eval_scenes = ...`")

  from dynibar_tpu.data.nvidia import NvidiaSceneData
  from dynibar_tpu.parallel.mesh import training_mesh
  mesh = training_mesh(config)   # multi-chip eval: chunks shard over rays
  if mesh is not None:
    print(f"mesh-sharded eval over {mesh.size} devices")
  all_results = {}
  for scene in config.eval_scenes:
    data = NvidiaSceneData(config, scene, height=config.training_height)
    config.num_frames = data.num_frames
    cfg = config.render_settings("ff")
    model = FFModel(cfg=cfg, num_frames=data.num_frames)

    if known.coarse_ckpt and known.fine_ckpt:
      from dynibar_tpu.utils.torch_convert import convert_ff_checkpoint
      params = convert_ff_checkpoint(known.coarse_ckpt, known.fine_ckpt)
      print("loaded converted torch checkpoints")
    else:
      payload, step = ckpt_lib.resume_from(config.out_folder(),
                                           config.ckpt_path)
      if payload is not None:
        params = payload["params"]
        print(f"resumed orbax checkpoint at step {step}")
      else:
        params = model.init_params(jax.random.PRNGKey(0))
        print("WARNING: no checkpoint found — evaluating random init")

    frame_range = (range(3, min(3 + known.max_frames, data.num_frames - 3))
                   if known.max_frames else None)
    result = evaluate_scene(
        config, model, params, scene,
        lpips_weights_dir=known.lpips_weights_dir or None,
        frame_range=frame_range, mesh=mesh)
    all_results[scene] = result
    print(f"[{scene}] {json.dumps(result)}")

  # cross-scene means (the paper-table aggregation)
  if len(all_results) > 1:
    agg = {}
    for region in ("full", "dynamic", "static"):
      agg[region] = {
          m: float(sum(r[region][m] for r in all_results.values())
                   / len(all_results))
          for m in ("psnr", "ssim", "lpips")}
    all_results["mean"] = agg
  print(json.dumps(all_results, indent=2))
  if known.results_json and jax.process_index() == 0:
    with open(known.results_json, "w") as fh:
      json.dump(all_results, fh, indent=2)
    print(f"wrote {known.results_json}")


if __name__ == "__main__":
  main()
