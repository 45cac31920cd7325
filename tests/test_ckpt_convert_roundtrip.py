"""torch .pth -> params conversion through real torch.save files, and
render-core coverage of occ_weights_mode 1/2."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.utils.torch_convert import convert_mono_checkpoint


def _linear_sd(prefix, dims, bias=True, sequential_gap=2):
  """state_dict entries for an nn.Sequential of Linears at 0,2,4..."""
  sd = {}
  for i, (din, dout) in enumerate(dims):
    idx = i * sequential_gap
    sd[f"{prefix}.{idx}.weight"] = torch.randn(dout, din)
    if bias:
      sd[f"{prefix}.{idx}.bias"] = torch.randn(dout)
  return sd


def _attention_sd(prefix):
  return {
      f"{prefix}.w_qs.weight": torch.randn(128, 128),
      f"{prefix}.w_ks.weight": torch.randn(128, 128),
      f"{prefix}.w_vs.weight": torch.randn(128, 128),
      f"{prefix}.fc.weight": torch.randn(128, 128),
      f"{prefix}.layer_norm.weight": torch.randn(128),
      f"{prefix}.layer_norm.bias": torch.randn(128),
  }


def _dynamic_sd(feat=32):
  sd = {}
  sd.update(_linear_sd("ray_dir_fc", [(21, 256), (256, feat + 3)]))
  sd.update(_linear_sd("base_fc", [((feat + 3) * 3, 256), (256, 128)]))
  sd.update(_linear_sd("vis_fc", [(128, 128), (128, 129)]))
  sd.update(_linear_sd("vis_fc2", [(128, 128), (128, 1)]))
  sd.update(_linear_sd("geometry_fc", [(257, 256), (256, 128)]))
  sd.update(_attention_sd("ray_attention"))
  sd.update(_linear_sd("ref_pts_fc", [(161, 256), (256, 128)]))
  sd.update(_linear_sd("out_geometry_fc", [(128, 128), (128, 1)]))
  sd.update(_linear_sd("rgb_fc", [(155, 128), (128, 64), (64, 3)]))
  return sd


def _static_sd(feat=32):
  sd = {"s": torch.tensor(0.25)}
  sd.update(_linear_sd("ray_dir_fc", [(103, 256), (256, feat + 3)]))
  sd.update(_linear_sd("ref_feature_fc", [(66, feat + 3)]))
  sd.update(_linear_sd("base_fc", [((feat + 3) * 6, 256), (256, 128)]))
  sd.update(_linear_sd("vis_fc", [(128, 128), (128, 129)]))
  sd.update(_linear_sd("vis_fc2", [(128, 128), (128, 1)]))
  sd.update(_linear_sd("geometry_fc", [(257, 256), (256, 128)]))
  sd.update(_attention_sd("ray_attention"))
  sd.update(_linear_sd("out_geometry_fc", [(128, 128), (128, 1)]))
  sd.update(_linear_sd("rgb_fc", [(261, 128), (128, 64), (64, 1)]))
  return sd


def _featnet_sd():
  sd = {
      "conv1.weight": torch.randn(64, 3, 7, 7),
      "bn1.weight": torch.randn(64), "bn1.bias": torch.randn(64),
      "out_conv.weight": torch.randn(64, 64, 1, 1),
      "out_conv.bias": torch.randn(64),
      # dead decoder weights the converter must ignore
      "layer2.0.conv1.weight": torch.randn(128, 64, 3, 3),
      "upconv3.conv.conv.weight": torch.randn(128, 256, 3, 3),
  }
  for b in range(3):
    for cname in ("conv1", "conv2"):
      sd[f"layer1.{b}.{cname}.weight"] = torch.randn(64, 64, 3, 3)
    for nname in ("bn1", "bn2"):
      sd[f"layer1.{b}.{nname}.weight"] = torch.randn(64)
      sd[f"layer1.{b}.{nname}.bias"] = torch.randn(64)
  sd["layer1.0.downsample.0.weight"] = torch.randn(64, 64, 1, 1)
  sd["layer1.0.downsample.1.weight"] = torch.randn(64)
  sd["layer1.0.downsample.1.bias"] = torch.randn(64)
  return sd


def _motion_sd():
  sd = {}
  in_ch = 132
  for i in range(8):
    din = in_ch if i == 0 else (256 + in_ch if i == 5 else 256)
    sd[f"pts_linears.{i}.weight"] = torch.randn(256, din)
    sd[f"pts_linears.{i}.bias"] = torch.randn(256)
  sd["coeff_linear.weight"] = torch.zeros(18, 256)
  sd["coeff_linear.bias"] = torch.zeros(18)
  return sd


def test_mono_pth_roundtrip(tmp_path):
  """Save a reference-format .pth (with DataParallel prefixes) and convert."""
  def with_module_prefix(sd):
    return {"module." + k: v for k, v in sd.items()}

  ckpt = {
      "net_coarse_st": with_module_prefix(_static_sd()),
      "net_coarse_dy": with_module_prefix(_dynamic_sd()),
      "feature_net": with_module_prefix(_featnet_sd()),
      "feature_net_st": with_module_prefix(_featnet_sd()),
      "motion_mlp": with_module_prefix(_motion_sd()),
      "traj_basis": torch.randn(24, 6),
      "global_step": 123,
      "optimizer": {}, "scheduler": {},
  }
  path = str(tmp_path / "model_latest.pth")
  torch.save(ckpt, path)

  params = convert_mono_checkpoint(path)
  # shapes land where the Flax modules expect them: run a forward
  from dynibar_tpu.models.dynibar import MonoModel
  cfg = RenderSettings(n_samples=16, num_views_dy=9, num_views_anchor=10,
                       num_views_static=6, num_vv=3, num_basis=6)
  model = MonoModel(cfg=cfg, num_frames=24)
  ref = model.init_params(jax.random.PRNGKey(0))
  # every expected leaf exists with the right shape
  def shapes(t):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x).shape, t)
  assert shapes(params["net_coarse_dy"]) == shapes(ref["net_coarse_dy"])
  assert shapes(params["net_coarse_st"]) == shapes(ref["net_coarse_st"])
  assert shapes(params["feature_net"]) == shapes(ref["feature_net"])
  assert shapes(params["motion_mlp"]) == shapes(ref["motion_mlp"])
  assert params["traj_basis"].shape == (24, 6)

  # and the converted params actually run through the render core
  from dynibar_tpu.data.ray_batch import synthetic_mono_batch
  from dynibar_tpu.render.render_rays import render_rays_mono
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=4, h=32, w=48, num_frames=24, ref_idx=10).items()}
  params = jax.tree_util.tree_map(jnp.asarray, params)

  @jax.jit
  def run(params, rb):
    dy, _ = model.apply_feature(params, rb["src_rgbs"])
    anchor, _ = model.apply_feature(params, rb["anchor_src_rgbs"])
    st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
    return render_rays_mono(model, params, rb, (dy, anchor, st), cfg,
                            is_train=False, det=True)
  out = run(params, rb)
  assert np.isfinite(np.asarray(out["outputs_coarse_ref"]["rgb"])).all()


@pytest.mark.parametrize("mode", [1, 2])
def test_occ_weights_modes(mode):
  from dynibar_tpu.data.ray_batch import synthetic_mono_batch
  from dynibar_tpu.models.dynibar import MonoModel
  from dynibar_tpu.render.render_rays import render_rays_mono
  cfg = RenderSettings(n_samples=8, num_views_dy=9, num_views_anchor=10,
                       num_views_static=6, num_vv=3, num_basis=4,
                       occ_weights_mode=mode)
  model = MonoModel(cfg=cfg, num_frames=32)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      cfg, n_rays=4, h=32, w=48, num_frames=32).items()}

  @jax.jit
  def run(params, rb, rng):
    dy, _ = model.apply_feature(params, rb["src_rgbs"])
    anchor, _ = model.apply_feature(params, rb["anchor_src_rgbs"])
    st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
    return render_rays_mono(model, params, rb, (dy, anchor, st), cfg,
                            is_train=True, det=False, rng=rng)
  ret = run(params, rb, jax.random.PRNGKey(1))
  ow = np.asarray(ret["outputs_coarse_anchor"]["occ_weights"])
  assert np.isfinite(ow).all() and ow.min() >= -1e-5 and ow.max() <= 1 + 1e-5
