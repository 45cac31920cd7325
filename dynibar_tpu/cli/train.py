"""Monocular training driver.

Rebuild of the reference training script (train.py:47-573):
phase 1 bootstraps the static model for init_decay_epoch/2 epochs, phase 2
runs the full 8-term loss until n_iters; checkpoints every i_weights steps,
scalars every i_print, full-frame TensorBoard panels every i_img.

Usage:  python -m dynibar_tpu.cli.train --config configs/train_scene.txt
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.data.pipeline import PrefetchPipeline
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.train.losses import schedule_weights
from dynibar_tpu.train.trainer import (TrainState, create_train_state,
                                       make_train_step)
from dynibar_tpu.utils import checkpoints as ckpt_lib
from dynibar_tpu.utils.logging import MetricsLogger


def parse_args() -> DynibarConfig:
  ap = argparse.ArgumentParser()
  ap.add_argument("--config", type=str, default=None)
  known, extra = ap.parse_known_args()
  overrides = {}
  it = iter(extra)
  for tok in it:
    if tok.startswith("--"):
      key = tok[2:]
      val = next(it, "true")
      overrides[key] = val
  if known.config:
    cfg = DynibarConfig.from_file(known.config)
  else:
    cfg = DynibarConfig()
  for k, v in overrides.items():
    if hasattr(cfg, k):
      cur = getattr(cfg, k)
      if isinstance(cur, bool):
        v = v.lower() in ("1", "true", "yes")
      elif isinstance(cur, int):
        v = int(v)
      elif isinstance(cur, float):
        v = float(v)
      elif isinstance(cur, list):
        v = v.split()
      setattr(cfg, k, v)
  return cfg


def main():
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  config = parse_args()
  if not config.train_scenes:
    raise SystemExit("error: no training scene — pass --config <file> with "
                     "`train_scenes = <scene>` or --train_scenes <scene>")

  # ---- device mesh FIRST: jax.distributed.initialize() (inside
  # training_mesh) must run before anything touches the backend, and the
  # dataset factory folds jax.process_index() into its sample streams ----
  import contextlib
  from dynibar_tpu.parallel.mesh import (replicate, shard_ray_batch,
                                         training_mesh)
  mesh = training_mesh(config)
  is_main = jax.process_index() == 0   # rank-0-only IO on multi-host

  from dynibar_tpu.data.factory import create_training_dataset
  data = create_training_dataset(config)
  config.num_frames = data.num_frames
  config.lrate_decay_steps = config.num_frames * config.init_decay_epoch
  cfg = config.render_settings("mono")

  out_folder = config.out_folder()
  os.makedirs(out_folder, exist_ok=True)
  if is_main:
    with open(os.path.join(out_folder, "args.json"), "w") as fh:
      json.dump({k: v for k, v in vars(config).items()}, fh, indent=2,
                default=str)

  model = MonoModel(cfg=cfg, num_frames=data.num_frames,
                    remat=config.use_remat)
  state, tx = create_train_state(model, config, jax.random.PRNGKey(0))

  template = {"params": jax.device_get(state.params),
              "opt_state": jax.device_get(state.opt_state),
              "step": np.int32(0)}
  payload, start_step = ckpt_lib.resume_from(
      out_folder, config.ckpt_path, config.no_reload, template=template)
  if payload is not None:
    params = payload["params"]
    opt_state = (payload["opt_state"]
                 if (not config.no_load_opt and "opt_state" in payload)
                 else state.opt_state)
    state = TrainState(params, opt_state, jnp.int32(start_step))
    print(f"resumed at step {start_step}")

  logger = MetricsLogger(os.path.join(config.rootdir, "logs",
                                      config.experiment_name()),
                         enabled=is_main)
  rng = jax.random.PRNGKey(1)
  global_step = int(state.step)
  start_epoch = global_step // data.num_frames

  if mesh is not None:
    if config.N_rand % mesh.size:
      raise SystemExit(f"error: N_rand={config.N_rand} must be divisible "
                       f"by the mesh size {mesh.size}")
    state = replicate(mesh, state)
    print(f"mesh-sharded training over {mesh.size} devices "
          f"({config.N_rand // mesh.size} rays/device)")

  def mesh_ctx():
    return mesh if mesh is not None else contextlib.nullcontext()

  def put(rb):
    return shard_ray_batch(mesh, rb) if mesh is not None else rb

  bootstrap_step = make_train_step(model, tx, cfg, bootstrap=True,
                                   donate=config.donate_buffers)
  full_step = make_train_step(model, tx, cfg, bootstrap=False,
                              donate=config.donate_buffers)

  def batches(epoch_holder):
    def sample(np_rng):
      return data.sample_batch(np_rng, config.N_rand, config.sample_mode)
    # multi-process: batches stay numpy until shard_ray_batch assembles the
    # global arrays (device_put here would just round-trip device->host)
    return PrefetchPipeline(sample, num_workers=config.workers,
                            seed=epoch_holder,
                            device_put=jax.process_count() == 1)

  # ---- phase 1: static bootstrap (reference train.py:116-225) ----
  with mesh_ctx(), batches(0) as pipe:
    for epoch in range(start_epoch, config.init_decay_epoch // 2):
      data.set_epoch(epoch)
      for _ in range(data.num_frames):
        rb = next(pipe)
        rng, sub = jax.random.split(rng)
        state, metrics = bootstrap_step(state, put(rb), None, sub)
        global_step += 1
        if global_step % config.i_print == 0:
          logger.scalars(global_step,
                         {k: float(v) for k, v in metrics.items()},
                         prefix="bootstrap/")

  # ---- phase 2: main loop (reference train.py:227-573) ----
  with mesh_ctx(), batches(1) as pipe:
    epoch = start_epoch
    t0 = time.time()
    while global_step < start_step + config.n_iters + 1:
      data.set_epoch(epoch)
      weights = schedule_weights(config, epoch)
      for _ in range(data.num_frames):
        rb = next(pipe)
        rng, sub = jax.random.split(rng)
        state, metrics = full_step(state, put(rb), weights, sub)
        global_step += 1

        if global_step % config.i_print == 0:
          vals = {k: float(v) for k, v in metrics.items()}
          vals["steps_per_sec"] = config.i_print / (time.time() - t0)
          t0 = time.time()
          logger.scalars(global_step, vals, prefix="train/")
          print(f"[{config.expname}] epoch {epoch} step {global_step} "
                + " ".join(f"{k}={v:.5f}" for k, v in vals.items()))

        if global_step % config.i_weights == 0 and is_main:
          ckpt_lib.save_checkpoint(out_folder, global_step,
                                   jax.device_get(state.params),
                                   jax.device_get(state.opt_state))
          print(f"saved checkpoint at {global_step}")

        if global_step % config.i_img == 0 and is_main:
          # full-frame render panels (reference train.py:548-571).
          # Multi-process: params are globally-sharded jax.Arrays that a
          # single rank cannot feed to a process-local jit — pull the
          # (fully-replicated, hence host-readable) copy so the panel
          # render runs rank-locally with no collective participation
          # required from the other ranks.
          from dynibar_tpu.train.view_logging import log_train_view
          log_params = (jax.device_get(state.params)
                        if jax.process_count() > 1 else state.params)
          rb_host = {k: np.asarray(v) for k, v in rb.items()}
          frame_idx = int(rb_host["ref_frame_idx"])
          provider = getattr(data, "providers", [data])[0]
          gt = provider._load_rgb(frame_idx)
          gt_disp = provider._load_disp(frame_idx)
          try:
            gt_flows = np.stack([provider._load_flow(frame_idx, o)[0]
                                 for o in (1, 2, 3, -1, -2, -3)])
          except (FileNotFoundError, OSError):
            gt_flows = None
          log_train_view(logger, global_step, model, log_params, rb_host,
                         cfg, config.chunk_size, gt, gt_disp,
                         gt_flows=gt_flows)

      # one-shot pre-virtual-view snapshot (reference train.py:503-506)
      if epoch + 1 == config.init_decay_epoch * 5 and is_main:
        ckpt_lib.save_checkpoint(out_folder, global_step,
                                 jax.device_get(state.params),
                                 jax.device_get(state.opt_state),
                                 name="model_no-vv")
      epoch += 1

  if is_main:
    ckpt_lib.save_checkpoint(out_folder, global_step,
                             jax.device_get(state.params),
                             jax.device_get(state.opt_state))


if __name__ == "__main__":
  main()
