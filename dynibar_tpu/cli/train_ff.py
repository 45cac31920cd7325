"""Forward-facing (Nvidia benchmark) fine-stage training driver.

The shipped reference trains only the mono model; DynibarFF's optimizer
layout (reference model.py:106-118: fine nets + feature_net_fine +
motion_mlp_fine + traj_basis_fine trainable, coarse stage loaded frozen
from ``coarse_dir``) implies the fine-stage training loop this driver
provides.  Loss terms mirror the mono assembly applied to the fine outputs
(train/losses.compute_ff_losses), with the cross-time branch rendered at
the fine stage (render/render_rays.render_rays_mv is_train=True).

``coarse_dir`` accepts either an orbax checkpoint folder produced by this
framework or a reference-format coarse ``.pth`` file (converted on load).

Usage:  python -m dynibar_tpu.cli.train_ff --config configs_nvidia/train_scene.txt
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.cli.train import parse_args
from dynibar_tpu.data import factory
from dynibar_tpu.data.nvidia import NvidiaSceneData
from dynibar_tpu.data.pipeline import PrefetchPipeline
from dynibar_tpu.models.dynibar import FFModel
from dynibar_tpu.train.losses import schedule_weights
from dynibar_tpu.train.trainer import (FF_COARSE_KEYS, TrainState,
                                       create_ff_train_state,
                                       make_ff_train_step)
from dynibar_tpu.utils import checkpoints as ckpt_lib
from dynibar_tpu.utils.logging import MetricsLogger


def load_coarse_params(coarse_dir: str):
  """Frozen coarse stage from an orbax run folder or a reference .pth."""
  if not coarse_dir:
    return None
  if coarse_dir.endswith(".pth"):
    from dynibar_tpu.utils.torch_convert import convert_ff_coarse_checkpoint
    return convert_ff_coarse_checkpoint(coarse_dir)
  path = ckpt_lib.latest_checkpoint(coarse_dir)
  if path is None:
    raise SystemExit(f"no checkpoint found under coarse_dir={coarse_dir}")
  payload = ckpt_lib.load_checkpoint(path)
  params = payload.get("params", payload)
  # a mono coarse run stores the same coarse keys this model freezes
  return {k: params[k] for k in FF_COARSE_KEYS}


def main():
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  config = parse_args()
  scenes = config.train_scenes or config.eval_scenes
  if not scenes:
    raise SystemExit("error: no scene — pass --config <file> with "
                     "`train_scenes = <scene>`")

  # mesh FIRST: jax.distributed.initialize() (inside training_mesh) must
  # precede any backend use (see cli/train.py)
  import contextlib
  from dynibar_tpu.parallel.mesh import (replicate, shard_ray_batch,
                                         training_mesh)
  mesh = training_mesh(config)
  is_main = jax.process_index() == 0   # rank-0-only IO on multi-host

  cfg = config.render_settings("ff_train")
  data = NvidiaSceneData(config, scenes[0], cfg=cfg,
                         height=config.training_height)
  config.num_frames = data.num_frames
  if config.lrate_decay_steps <= 0:
    config.lrate_decay_steps = data.num_frames * config.init_decay_epoch

  out_folder = os.path.join(config.rootdir, "checkpoints", "fine",
                            config.expname)
  os.makedirs(out_folder, exist_ok=True)
  if is_main:
    with open(os.path.join(out_folder, "args.json"), "w") as fh:
      json.dump({k: v for k, v in vars(config).items()}, fh, indent=2,
                default=str)

  model = FFModel(cfg=cfg, num_frames=data.num_frames)
  coarse = load_coarse_params(config.coarse_dir)
  state, tx = create_ff_train_state(model, config, jax.random.PRNGKey(0),
                                    coarse_params=coarse)

  template = {"params": jax.device_get(state.params),
              "opt_state": jax.device_get(state.opt_state),
              "step": np.int32(0)}
  payload, start_step = ckpt_lib.resume_from(
      out_folder, config.ckpt_path, config.no_reload, template=template)
  if payload is not None:
    opt_state = (payload["opt_state"]
                 if (not config.no_load_opt and "opt_state" in payload)
                 else state.opt_state)
    state = TrainState(payload["params"], opt_state, jnp.int32(start_step))
    print(f"resumed at step {start_step}")

  logger = MetricsLogger(os.path.join(config.rootdir, "logs",
                                      "fine_" + config.expname),
                         enabled=is_main)
  step_fn = make_ff_train_step(model, tx, cfg,
                               donate=config.donate_buffers)

  if mesh is not None:
    if config.N_rand % mesh.size:
      raise SystemExit(f"error: N_rand={config.N_rand} must be divisible "
                       f"by the mesh size {mesh.size}")
    state = replicate(mesh, state)
    print(f"mesh-sharded training over {mesh.size} devices "
          f"({config.N_rand // mesh.size} rays/device)")

  def put(rb):
    return shard_ray_batch(mesh, rb) if mesh is not None else rb

  # multi-host: view-level draws stay on the process-SHARED stream (every
  # rank must build identical replicated batch keys — the
  # make_array_from_process_local_data contract); only the ray positions
  # come from a per-process pixel stream (cli.train gets this from the
  # dataset factory; the Nvidia provider is driven directly here)
  n_proc, proc_id = jax.process_count(), jax.process_index()

  def sample(np_rng):
    pixel_rng = (factory.fold_pixel_rng(np_rng, proc_id)
                 if n_proc > 1 else None)
    return data.sample_batch(np_rng, config.N_rand, pixel_rng=pixel_rng)

  rng = jax.random.PRNGKey(1)
  global_step = int(state.step)
  t0 = time.time()
  with (mesh if mesh is not None else contextlib.nullcontext()), \
       PrefetchPipeline(sample, num_workers=config.workers, seed=0,
                        device_put=n_proc == 1) as pipe:
    while global_step < start_step + config.n_iters + 1:
      epoch = global_step // data.num_frames
      data.set_epoch(epoch)
      weights = schedule_weights(config, epoch)
      rb = next(pipe)
      rng, sub = jax.random.split(rng)
      state, metrics = step_fn(state, put(rb), weights, sub)
      global_step += 1

      if global_step % config.i_print == 0:
        vals = {k: float(v) for k, v in metrics.items()}
        vals["steps_per_sec"] = config.i_print / (time.time() - t0)
        t0 = time.time()
        logger.scalars(global_step, vals, prefix="train_fine/")
        print(f"[{config.expname}] step {global_step} "
              + " ".join(f"{k}={v:.5f}" for k, v in vals.items()))

      if global_step % config.i_weights == 0 and is_main:
        ckpt_lib.save_checkpoint(out_folder, global_step,
                                 jax.device_get(state.params),
                                 jax.device_get(state.opt_state))
        print(f"saved checkpoint at {global_step}")

  if is_main:
    ckpt_lib.save_checkpoint(out_folder, global_step,
                             jax.device_get(state.params),
                             jax.device_get(state.opt_state))


if __name__ == "__main__":
  main()
