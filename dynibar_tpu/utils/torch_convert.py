"""PyTorch → JAX checkpoint conversion shim.

Loads the reference's released ``.pth`` checkpoints (reference
model.py:177-256 save/load format) and maps each torch state_dict onto the
corresponding Flax parameter subtree of this framework, so pretrained
DynIBaR models can be evaluated without retraining (BASELINE.md north star).

Name-mapping rules (torch key -> flax path):
  * Linear ``weight`` [out, in] -> ``kernel`` [in, out] (transposed);
    Conv2d ``weight`` [out, in, kh, kw] -> ``kernel`` [kh, kw, in, out].
  * nn.Sequential indices map to ``dense_{i}`` of :class:`MLP` — only Linear
    layers count (activations own no params): seq index 0 -> dense_0,
    seq index 2 -> dense_1, ...
  * InstanceNorm ``weight/bias`` -> ``scale/bias``.
  * feature net: conv1/bn1/layer1.{0,1,2}/out_conv map 1:1; layer2/3 and the
    upconv decoder are dead in the reference forward
    (feature_network.py:302-311) and are skipped.
  * aggregators: base_fc/vis_fc/vis_fc2/geometry_fc live under the shared
    ``vis_pooling`` scope here.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
  """torch Linear weight -> flax kernel."""
  return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
  """torch Conv2d OIHW -> flax HWIO."""
  return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _seq_linear(sd: Dict[str, np.ndarray], prefix: str, torch_idx: int,
                flax_idx: int, out: Dict[str, Any], scope: str):
  out.setdefault(scope, {})[f"dense_{flax_idx}"] = {
      "kernel": _t(sd[f"{prefix}.{torch_idx}.weight"]),
      **({"bias": sd[f"{prefix}.{torch_idx}.bias"]}
         if f"{prefix}.{torch_idx}.bias" in sd else {}),
  }


def _mlp(sd, prefix, torch_indices, scope_name) -> Dict[str, Any]:
  out = {}
  for flax_idx, t_idx in enumerate(torch_indices):
    entry = {"kernel": _t(sd[f"{prefix}.{t_idx}.weight"])}
    if f"{prefix}.{t_idx}.bias" in sd:
      entry["bias"] = sd[f"{prefix}.{t_idx}.bias"]
    out[f"dense_{flax_idx}"] = entry
  return out


def _attention(sd, prefix) -> Dict[str, Any]:
  return {
      "w_qs": {"kernel": _t(sd[f"{prefix}.w_qs.weight"])},
      "w_ks": {"kernel": _t(sd[f"{prefix}.w_ks.weight"])},
      "w_vs": {"kernel": _t(sd[f"{prefix}.w_vs.weight"])},
      "fc": {"kernel": _t(sd[f"{prefix}.fc.weight"])},
      "layer_norm": {"scale": sd[f"{prefix}.layer_norm.weight"],
                     "bias": sd[f"{prefix}.layer_norm.bias"]},
  }


def _instance_norm(sd, prefix) -> Dict[str, Any]:
  return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_feature_net(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
  """ResNet state_dict -> FeatureNet params (live layers only)."""
  out: Dict[str, Any] = {
      "conv1": {"kernel": _conv(sd["conv1.weight"])},
      "bn1": _instance_norm(sd, "bn1"),
      "out_conv": {"kernel": _conv(sd["out_conv.weight"]),
                   "bias": sd["out_conv.bias"]},
  }
  for b in range(3):
    blk = {
        "conv1": {"kernel": _conv(sd[f"layer1.{b}.conv1.weight"])},
        "bn1": _instance_norm(sd, f"layer1.{b}.bn1"),
        "conv2": {"kernel": _conv(sd[f"layer1.{b}.conv2.weight"])},
        "bn2": _instance_norm(sd, f"layer1.{b}.bn2"),
    }
    if f"layer1.{b}.downsample.0.weight" in sd:
      blk["downsample_conv"] = {
          "kernel": _conv(sd[f"layer1.{b}.downsample.0.weight"])}
      blk["downsample_norm"] = _instance_norm(sd, f"layer1.{b}.downsample.1")
    out[f"layer1_{b}"] = blk
  return out


def convert_dynamic_aggregator(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
  """DynibarDynamic state_dict -> DynamicAggregator params."""
  return {
      "ray_dir_fc": _mlp(sd, "ray_dir_fc", (0, 2), "ray_dir_fc"),
      "vis_pooling": {
          "base_fc": _mlp(sd, "base_fc", (0, 2), "base_fc"),
          "vis_fc": _mlp(sd, "vis_fc", (0, 2), "vis_fc"),
          "vis_fc2": _mlp(sd, "vis_fc2", (0, 2), "vis_fc2"),
          "geometry_fc": _mlp(sd, "geometry_fc", (0, 2), "geometry_fc"),
      },
      "ray_attention": _attention(sd, "ray_attention"),
      "ref_pts_fc": _mlp(sd, "ref_pts_fc", (0, 2), "ref_pts_fc"),
      "out_geometry_fc": _mlp(sd, "out_geometry_fc", (0, 2),
                              "out_geometry_fc"),
      "rgb_fc": _mlp(sd, "rgb_fc", (0, 2, 4), "rgb_fc"),
  }


def convert_static_aggregator(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
  """DynibarStatic state_dict -> StaticAggregator params."""
  out = {
      "ray_dir_fc": _mlp(sd, "ray_dir_fc", (0, 2), "ray_dir_fc"),
      "ref_feature_fc": {
          "kernel": _t(sd["ref_feature_fc.0.weight"]),
          "bias": sd["ref_feature_fc.0.bias"],
      },
      "vis_pooling": {
          "base_fc": _mlp(sd, "base_fc", (0, 2), "base_fc"),
          "vis_fc": _mlp(sd, "vis_fc", (0, 2), "vis_fc"),
          "vis_fc2": _mlp(sd, "vis_fc2", (0, 2), "vis_fc2"),
          "geometry_fc": _mlp(sd, "geometry_fc", (0, 2), "geometry_fc"),
      },
      "ray_attention": _attention(sd, "ray_attention"),
      "out_geometry_fc": _mlp(sd, "out_geometry_fc", (0, 2),
                              "out_geometry_fc"),
      "rgb_fc": _mlp(sd, "rgb_fc", (0, 2, 4), "rgb_fc"),
  }
  if "s" in sd:
    out["s"] = sd["s"]
  return out


def convert_motion_mlp(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
  out: Dict[str, Any] = {}
  for i in range(8):
    out[f"pts_linears_{i}"] = {
        "kernel": _t(sd[f"pts_linears.{i}.weight"]),
        "bias": sd[f"pts_linears.{i}.bias"],
    }
  out["coeff_kernel"] = _t(sd["coeff_linear.weight"])
  out["coeff_bias"] = sd["coeff_linear.bias"]
  return out


def _strip_module(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
  """Drop DataParallel 'module.' prefixes; tensors -> numpy."""
  out = {}
  for k, v in sd.items():
    k = k[len("module."):] if k.startswith("module.") else k
    out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v)
  return out


def convert_mono_checkpoint(pth_path: str) -> Dict[str, Any]:
  """Reference DynibarMono .pth -> MonoModel params pytree."""
  import torch
  ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
  params = {
      "net_coarse_st": convert_static_aggregator(
          _strip_module(ckpt["net_coarse_st"])),
      "net_coarse_dy": convert_dynamic_aggregator(
          _strip_module(ckpt["net_coarse_dy"])),
      "feature_net": convert_feature_net(_strip_module(ckpt["feature_net"])),
      "feature_net_st": convert_feature_net(
          _strip_module(ckpt["feature_net_st"])),
      "motion_mlp": convert_motion_mlp(_strip_module(ckpt["motion_mlp"])),
      "traj_basis": np.asarray(ckpt["traj_basis"].detach().cpu().numpy()),
  }
  return params


def convert_ff_coarse_checkpoint(coarse_pth: str) -> Dict[str, Any]:
  """Reference DynibarFF *coarse* .pth (the coarse_dir checkpoint loaded by
  model.py:192-209) -> the frozen-coarse subtree of the FFModel params."""
  import torch
  coarse = torch.load(coarse_pth, map_location="cpu", weights_only=False)
  return {
      "net_coarse_st": convert_static_aggregator(
          _strip_module(coarse["net_coarse_st"])),
      "net_coarse_dy": convert_dynamic_aggregator(
          _strip_module(coarse["net_coarse_dy"])),
      "feature_net": convert_feature_net(
          _strip_module(coarse["feature_net"])),
      "motion_mlp": convert_motion_mlp(_strip_module(coarse["motion_mlp"])),
      "traj_basis": np.asarray(coarse["traj_basis"].detach().cpu().numpy()),
  }


def convert_ff_checkpoint(coarse_pth: str, fine_pth: str) -> Dict[str, Any]:
  """Reference DynibarFF coarse+fine .pth pair -> FFModel params pytree."""
  import torch
  coarse = torch.load(coarse_pth, map_location="cpu", weights_only=False)
  fine = torch.load(fine_pth, map_location="cpu", weights_only=False)
  return {
      "net_coarse_st": convert_static_aggregator(
          _strip_module(coarse["net_coarse_st"])),
      "net_coarse_dy": convert_dynamic_aggregator(
          _strip_module(coarse["net_coarse_dy"])),
      "feature_net": convert_feature_net(
          _strip_module(coarse["feature_net"])),
      "motion_mlp": convert_motion_mlp(_strip_module(coarse["motion_mlp"])),
      "traj_basis": np.asarray(coarse["traj_basis"].detach().cpu().numpy()),
      "net_fine_st": convert_static_aggregator(
          _strip_module(fine["net_fine_st"])),
      "net_fine_dy": convert_dynamic_aggregator(
          _strip_module(fine["net_fine_dy"])),
      "feature_net_fine": convert_feature_net(
          _strip_module(fine["feature_net_fine"])),
      "motion_mlp_fine": convert_motion_mlp(
          _strip_module(fine["motion_mlp_fine"])),
      "traj_basis_fine": np.asarray(
          fine["traj_basis_fine"].detach().cpu().numpy()),
  }
