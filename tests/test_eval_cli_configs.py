"""The shipped per-scene Nvidia configs drive cli.eval_nvidia end-to-end
on a synthetic benchmark-layout scene (VERDICT round-1 item: the 7-scene
north-star run needs these files + their wiring)."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_scene_configs_parse():
  from dynibar_tpu.config import DynibarConfig
  names = ["balloon1", "balloon2", "dynamicFace", "jumping", "playground",
           "skating", "truck", "umbrella"]
  for name in names:
    path = os.path.join(REPO, "configs_nvidia", f"eval_{name}_long.txt")
    cfg = DynibarConfig.from_file(path)
    assert cfg.eval_scenes, name
    assert cfg.N_importance == 64 and cfg.inv_uniform, name
    assert cfg.mask_static and not cfg.mask_rgb, name
    assert cfg.coarse_dir.endswith(name), name
  for fname in ("train_kid-running.txt", "test_kid-running.txt"):
    cfg = DynibarConfig.from_file(os.path.join(REPO, "configs", fname))
    assert cfg.inv_uniform and cfg.num_vv == 3 and cfg.mask_src_view


def test_eval_balloon1_config_reaches_render_loop(tmp_path, capsys,
                                                  monkeypatch):
  from dynibar_tpu.data.synthetic_scene import write_synthetic_nvidia_scene
  from dynibar_tpu.cli import eval_nvidia as cli

  write_synthetic_nvidia_scene(str(tmp_path), scene="Balloon1",
                               num_frames=12, height=32, width=48)
  results = str(tmp_path / "metrics.json")
  monkeypatch.setattr(sys, "argv", [
      "eval_nvidia",
      "--config", os.path.join(REPO, "configs_nvidia",
                               "eval_balloon1_long.txt"),
      "--folder_path", str(tmp_path),
      "--rootdir", str(tmp_path),
      "--training_height", "32",
      "--N_samples", "4", "--N_importance", "4",
      "--chunk_size", "256",
      "--compute_dtype", "float32",
      "--max_frames", "1",
      "--results_json", results,
  ])
  cli.main()
  out = capsys.readouterr().out
  assert "frame 3 cam" in out          # the render loop ran
  assert "evaluating random init" in out  # no checkpoint in this env
  with open(results) as fh:
    metrics = json.load(fh)
  table = metrics["Balloon1"]
  assert set(table) == {"full", "dynamic", "static"}
  assert np.isfinite(table["full"]["psnr"])
  assert np.isfinite(table["full"]["ssim"])


def test_eval_cli_with_converted_torch_checkpoints(tmp_path, capsys,
                                                   monkeypatch):
  """The released-checkpoint path: --coarse_ckpt/--fine_ckpt reference-format
  .pth pairs convert and drive the full eval protocol."""
  import torch

  from dynibar_tpu.cli import eval_nvidia as cli
  from dynibar_tpu.data.synthetic_scene import write_synthetic_nvidia_scene
  from tests.test_ckpt_convert_roundtrip import (_dynamic_sd, _featnet_sd,
                                                 _motion_sd, _static_sd)

  write_synthetic_nvidia_scene(str(tmp_path), scene="Balloon1",
                               num_frames=12, height=32, width=48)
  coarse_pth = str(tmp_path / "coarse.pth")
  fine_pth = str(tmp_path / "fine.pth")
  basis = torch.randn(12, 6)
  torch.save({"net_coarse_st": _static_sd(), "net_coarse_dy": _dynamic_sd(),
              "feature_net": _featnet_sd(), "motion_mlp": _motion_sd(),
              "traj_basis": basis, "global_step": 0}, coarse_pth)
  torch.save({"net_fine_st": _static_sd(), "net_fine_dy": _dynamic_sd(),
              "feature_net_fine": _featnet_sd(),
              "motion_mlp_fine": _motion_sd(),
              "traj_basis_fine": basis, "global_step": 0}, fine_pth)

  results = str(tmp_path / "metrics.json")
  monkeypatch.setattr(sys, "argv", [
      "eval_nvidia",
      "--config", os.path.join(REPO, "configs_nvidia",
                               "eval_balloon1_long.txt"),
      "--folder_path", str(tmp_path),
      "--rootdir", str(tmp_path),
      "--training_height", "32",
      "--N_samples", "4", "--N_importance", "4",
      "--chunk_size", "256",
      "--compute_dtype", "float32",
      "--max_frames", "1",
      "--coarse_ckpt", coarse_pth,
      "--fine_ckpt", fine_pth,
      "--results_json", results,
  ])
  cli.main()
  out = capsys.readouterr().out
  assert "loaded converted torch checkpoints" in out
  with open(results) as fh:
    metrics = json.load(fh)
  assert np.isfinite(metrics["Balloon1"]["full"]["psnr"])
