"""The production monocular train driver, end to end on the CPU mesh.

Runs cli.train.main() on the tiny on-disk scene through BOTH phases
(static bootstrap + full loss) with mesh-sharded training over the 8
virtual devices — the exact code path a real multi-chip run takes:
config parsing, dataset factory, mesh/replicate/shard wiring, the
prefetch pipeline, checkpoint save and the final snapshot.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax

from tests.test_dataset_on_disk import build_tiny_scene


@pytest.mark.parametrize(
    "mesh_shape",
    [pytest.param("8", marks=pytest.mark.compileheavy), "1"])
def test_train_cli_two_phases(tmp_path, monkeypatch, mesh_shape):
  scene_root = build_tiny_scene(tmp_path / "scenes")
  rootdir = tmp_path / "run" / mesh_shape
  argv = [
      "train",
      "--folder_path", str(scene_root),
      "--train_scenes", "tiny",
      "--rootdir", str(rootdir),
      "--training_height", "32",
      "--num_source_views", "4",
      "--max_range", "8",
      "--num_vv", "2",
      "--init_decay_epoch", "2",
      "--N_rand", "16",
      "--N_samples", "8",
      "--num_basis", "4",
      "--n_iters", "13",
      "--i_print", "6",
      "--i_weights", "12",
      "--i_img", "100000",           # skip the full-frame panel render
      "--workers", "1",
      "--mesh_shape", mesh_shape,
      "--expname", "cli_smoke",
  ]
  monkeypatch.setattr(sys, "argv", argv)
  from dynibar_tpu.cli.train import main
  if mesh_shape == "8":
    assert jax.device_count() >= 8
  main()

  # both phases ran: a final checkpoint exists and restores finite params
  out_dirs = []
  for base, dirs, _ in os.walk(rootdir):
    out_dirs += [os.path.join(base, d) for d in dirs
                 if d.startswith("model_")]
  assert out_dirs, "no checkpoint written"
  latest = sorted(out_dirs)[-1]
  from dynibar_tpu.utils.checkpoints import load_checkpoint
  payload = load_checkpoint(latest)
  # 12 bootstrap steps (1 epoch), then phase 2 completes its epoch
  assert int(payload["step"]) >= 13
  leaves = jax.tree_util.tree_leaves(payload["params"])
  assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

  # args.json snapshot carries the run configuration
  args_files = []
  for base, _, files in os.walk(rootdir):
    args_files += [os.path.join(base, f) for f in files if f == "args.json"]
  assert args_files
  cfgjson = json.load(open(args_files[0]))
  assert cfgjson["mesh_shape"] == mesh_shape

  if mesh_shape != "8":
    return
  # ---- chain: cli.render_monocular consumes the checkpoint (stab path,
  # mesh-sharded full-image rendering, png + mp4 outputs) ----
  render_argv = argv.copy()
  render_argv[0] = "render_monocular"
  render_argv += ["--render_idx", "-1", "--chunk_size", "256",
                  "--video_out", "auto"]
  monkeypatch.setattr(sys, "argv", render_argv)
  from dynibar_tpu.cli.render_monocular import main as render_main
  render_main()
  render_dirs = []
  for base, dirs, files in os.walk(rootdir):
    if os.path.basename(base) == "render_stab":
      render_dirs.append((base, files))
  assert render_dirs, "render_stab output folder missing"
  base, files = render_dirs[0]
  pngs = [f for f in files if f.endswith(".png")]
  assert len(pngs) >= 12                      # one frame per video pose
  assert "video.mp4" in files
  import imageio.v2 as imageio
  frame = imageio.imread(os.path.join(base, sorted(pngs)[0]))
  assert frame.ndim == 3 and frame.shape[-1] == 3
  assert np.isfinite(frame).all()


def test_train_ff_cli_mesh(tmp_path, monkeypatch):
  """The FF fine-stage driver (cli.train_ff.main) end to end: synthetic
  Nvidia-layout scene + orbax coarse checkpoint -> mesh-sharded fine
  training over the virtual devices -> checkpoint with frozen coarse."""
  from dynibar_tpu.config import DynibarConfig
  from dynibar_tpu.data.synthetic_scene import write_synthetic_scene
  from dynibar_tpu.models.dynibar import FFModel
  from dynibar_tpu.train.trainer import FF_COARSE_KEYS
  from dynibar_tpu.utils import checkpoints as ckpt_lib

  data_dir = tmp_path / "data"
  scene = write_synthetic_scene(str(data_dir), num_frames=12, height=32,
                                width=48)

  over = dict(folder_path=str(data_dir), training_height=32, N_rand=16,
              N_samples=4, N_importance=4, num_basis=4, mask_static=False)
  config = DynibarConfig(**over)
  cfg = config.render_settings("ff_train")
  donor = FFModel(cfg=cfg, num_frames=12).init_params(jax.random.PRNGKey(7))
  coarse_dir = tmp_path / "coarse"
  ckpt_lib.save_checkpoint(str(coarse_dir), 0,
                           {k: donor[k] for k in FF_COARSE_KEYS})

  rootdir = tmp_path / "run"
  argv = ["train_ff", "--folder_path", str(data_dir),
          "--train_scenes", scene,
          "--rootdir", str(rootdir),
          "--training_height", "32",
          "--N_rand", "16", "--N_samples", "4", "--N_importance", "4",
          "--num_basis", "4", "--mask_static", "false",
          "--n_iters", "2", "--i_print", "1", "--i_weights", "2",
          "--workers", "1", "--mesh_shape", "8",
          "--coarse_dir", str(coarse_dir),
          "--expname", "ff_smoke"]
  monkeypatch.setattr(sys, "argv", argv)
  from dynibar_tpu.cli.train_ff import main
  main()

  latest = ckpt_lib.latest_checkpoint(
      os.path.join(str(rootdir), "checkpoints", "fine", "ff_smoke"))
  assert latest is not None
  payload = ckpt_lib.load_checkpoint(latest)
  assert int(payload["step"]) >= 2
  # the frozen coarse subtree is exactly the donor's
  for key in FF_COARSE_KEYS:
    got = jax.tree_util.tree_leaves(payload["params"][key])
    want = jax.tree_util.tree_leaves(donor[key])
    for g, w in zip(got, want):
      np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
