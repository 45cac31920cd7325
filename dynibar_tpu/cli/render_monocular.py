"""Space-time (bullet-time / stabilized) video rendering CLI.

Rebuild of the reference render_monocular_bt.py: renders every frame of the
video along a smoothed (stabilization) camera path, or a circular wander
path around --render_idx, using interval-based static source selection
(render_monocular_bt.py:120-155) and writes PNG frames with a 3% border crop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.cli.train import parse_args as parse_config_args
from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.core.cameras import make_camera
from dynibar_tpu.data.monocular import MonocularSceneData
from dynibar_tpu.data.ray_batch import MONO_SRC_OFFSETS
from dynibar_tpu.data.view_selection import get_interval_pose_ids
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                             render_image_mono)
from dynibar_tpu.utils import checkpoints as ckpt_lib


def render_batch_template(data: MonocularSceneData, idx: int,
                          num_source_views: int, num_vv: int,
                          rng: np.random.RandomState):
  """Source stacks for rendering frame `idx` (no supervision fields)."""
  cfg = data.cfg
  src_rgbs, src_cams, src_off, src_valid = [], [], [], []
  for o in MONO_SRC_OFFSETS:
    i = int(np.clip(idx + o, 0, data.num_frames - 1))
    src_rgbs.append(data._load_rgb(i))
    src_cams.append(data._camera(i))
    src_off.append(o + 3)
    src_valid.append(1.0)
  for vv_i in rng.choice(8, size=num_vv, replace=False):
    r, c = data._load_vv(idx, int(vv_i))
    src_rgbs.append(r)
    src_cams.append(c)
    src_off.append(3)
    src_valid.append(1.0)

  # interval-based static selection (render_monocular_bt.py:120-155)
  st_ids = get_interval_pose_ids(data.c2w[idx], data.c2w, tar_id=idx,
                                 interval=10)
  st_ids = np.sort(st_ids[: 2 * num_source_views])
  st_rgbs, st_cams, st_valid = [], [], []
  for i in st_ids[: cfg.num_views_static]:
    st_rgbs.append(data._masked_src(int(i)))
    st_cams.append(data._camera(int(i)))
    st_valid.append(1.0)
  while len(st_rgbs) < cfg.num_views_static:
    st_rgbs.append(np.zeros_like(st_rgbs[0]))
    st_cams.append(st_cams[0])
    st_valid.append(0.0)

  return {
      "depth_range": data.depth_range,
      "ref_time": np.float32(idx / data.num_frames),
      "anchor_time": np.float32(idx / data.num_frames),
      "ref_frame_idx": np.int32(idx),
      "anchor_frame_idx": np.int32(idx),
      "src_rgbs": np.stack(src_rgbs),
      "src_cameras": np.stack(src_cams),
      "src_offset_idx": np.array(src_off, np.int32),
      "src_valid": np.array(src_valid, np.float32),
      "static_src_rgbs": np.stack(st_rgbs),
      "static_src_cameras": np.stack(st_cams),
      "static_valid": np.array(st_valid, np.float32),
  }


def main():
  import imageio.v2 as imageio
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  config = parse_config_args()
  scene = config.train_scenes[0]
  data = MonocularSceneData(config, scene)
  config.num_frames = data.num_frames
  cfg = config.render_settings("mono")
  model = MonoModel(cfg=cfg, num_frames=data.num_frames)

  payload, step = ckpt_lib.resume_from(config.out_folder(), config.ckpt_path)
  if payload is None:
    raise SystemExit(f"no checkpoint in {config.out_folder()}")
  params = payload["params"]
  print(f"rendering with checkpoint step {step}")

  out_dir = os.path.join(config.out_folder(),
                         f"render_{'wander' if config.render_idx >= 0 else 'stab'}")
  os.makedirs(out_dir, exist_ok=True)
  rng = np.random.RandomState(0)

  from dynibar_tpu.parallel.mesh import training_mesh
  mesh = training_mesh(config)
  if mesh is not None:
    print(f"mesh-sharded rendering over {mesh.size} devices")

  render_poses = data.render_poses
  num_out = len(render_poses)
  video_frames = []
  for out_i in range(num_out):
    # wander path orbits one frame; stabilization tracks the video
    idx = config.render_idx if config.render_idx >= 0 else out_i
    idx = int(np.clip(idx, 3, data.num_frames - 4))
    template = render_batch_template(data, idx, config.num_source_views,
                                     config.num_vv, rng)
    hwf = render_poses[out_i][:, 4]
    h, w = int(hwf[0]), int(hwf[1])
    from dynibar_tpu.data.llff import parse_llff_pose
    intr, c2w = parse_llff_pose(render_poses[out_i])
    camera = make_camera(h, w, intr, c2w)

    rb = {k: jnp.asarray(v) for k, v in template.items()}
    rb = full_image_ray_batch(rb, jnp.asarray(camera))
    dy, _ = model.apply_feature(params, rb["src_rgbs"])
    st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
    ret = render_image_mono(model, params, rb, (dy, None, st), cfg,
                            config.chunk_size, h, w, mesh=mesh)
    rgb = np.asarray(ret["outputs_coarse_ref"]["rgb"])
    # 3% border crop (render_monocular_bt.py:349-356)
    ch, cw = int(h * 0.03), int(w * 0.03)
    rgb = rgb[ch:h - ch, cw:w - cw]
    path = os.path.join(out_dir, f"{out_i:05d}.png")
    imageio.imwrite(path, (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {path}")
    if config.video_out:
      video_frames.append(rgb)

  if config.video_out and video_frames:
    from dynibar_tpu.serve.video import write_mp4
    vpath = (os.path.join(out_dir, "video.mp4")
             if config.video_out == "auto" else config.video_out)
    write_mp4(vpath, video_frames, fps=config.video_fps)
    print(f"wrote {vpath}")


if __name__ == "__main__":
  main()
