"""The 8-term monocular training loss.

Rebuild of the loss assembly in the reference train loop
(train.py:300-456) plus the criterion helpers (ibrnet/criterion.py:21-85,
utils.py:32-39).  All epoch-dependent decay factors arrive as *traced scalar
arguments* (a `LossSchedule` pytree) so changing epoch never retraces the
compiled train step (SURVEY.md §7 "Dynamic loss schedules").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dynibar_tpu.ops.distortion import eff_distloss

EPSILON = 1e-3
TINY = 1e-6


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LossWeights:
  """Per-step effective loss weights (host computes decay; device consumes).

  Built by :func:`schedule_weights` from the config + epoch; every field is a
  scalar jnp/float so the train step signature is stable.
  """

  w_disp: Any
  w_flow: Any
  w_cycle: Any
  w_reg: Any
  w_skew_entropy: Any
  w_distortion: Any
  dynamic_rgb_decay: Any   # 1 / 10**divisor
  use_dynamic_mask_rgb: Any  # 1.0 while epoch < init_decay_epoch else 0.0
  suppress_dynamic: Any      # 1.0 once divisor > 4 else 0.0


def schedule_weights(cfg, epoch: int) -> LossWeights:
  """Host-side decay schedule (reference train.py:302-445)."""
  divisor = epoch // cfg.init_decay_epoch
  if cfg.anneal_cycle:
    w_cycle = min(0.5, cfg.w_cycle + divisor * cfg.cycle_factor)
  else:
    w_cycle = cfg.w_cycle
  return LossWeights(
      w_disp=jnp.float32(cfg.w_disp / (cfg.decay_rate ** divisor)),
      w_flow=jnp.float32(cfg.w_flow / (cfg.decay_rate ** divisor)),
      w_cycle=jnp.float32(w_cycle),
      w_reg=jnp.float32(cfg.w_reg),
      w_skew_entropy=jnp.float32(cfg.w_skew_entropy),
      w_distortion=jnp.float32(cfg.w_distortion),
      dynamic_rgb_decay=jnp.float32(1.0 / (10.0 ** divisor)),
      use_dynamic_mask_rgb=jnp.float32(1.0 if epoch < cfg.init_decay_epoch
                                       else 0.0),
      suppress_dynamic=jnp.float32(1.0 if divisor > 4 else 0.0),
  )


def charbonnier_rgb(pred_rgb, gt_rgb, mask):
  """Masked Charbonnier (utils.py:32-39 img2charbonier)."""
  err = jnp.sqrt((pred_rgb - gt_rgb) ** 2 + EPSILON ** 2)
  return (jnp.sum(err * mask[..., None])
          / (jnp.sum(mask) * pred_rgb.shape[-1] + TINY))


def temporal_rgb_loss(outputs, gt_rgb, motion_mask=None):
  """Occlusion-weighted cross-time RGB loss (criterion.py:42-56)."""
  pred = outputs["rgb"]
  w = outputs["mask"].astype(pred.dtype) * outputs["occ_weight_map"]
  if motion_mask is not None:
    w = w * motion_mask
  err = jnp.sqrt((pred - gt_rgb) ** 2 + EPSILON ** 2)
  return jnp.sum(w[..., None] * err) / (3.0 * jnp.sum(w) + 1e-8)


def flow_loss(render_flow, gt_flow, gt_mask):
  """Masked L1 flow loss (criterion.py:83-85)."""
  m = jnp.broadcast_to(gt_mask, gt_flow.shape[:-1] + (1,))
  m2 = jnp.concatenate([m, m], axis=-1)
  return (jnp.sum(jnp.abs(render_flow - gt_flow) * m2)
          / (jnp.sum(m2) + 1e-8))


def compute_mono_losses(ret: Dict[str, Any], rb: Dict[str, Any],
                        w: LossWeights) -> Dict[str, jnp.ndarray]:
  """Full 8-term loss (train.py:300-456). Returns each term + total."""
  return _assemble_losses(
      ret["outputs_coarse_ref"], ret["outputs_coarse_ref_dy"],
      ret["outputs_coarse_anchor"], ret["outputs_coarse_anchor_dy"], rb, w)


def compute_ff_losses(ret: Dict[str, Any], rb: Dict[str, Any],
                      w: LossWeights) -> Dict[str, jnp.ndarray]:
  """Fine-stage loss for forward-facing training.

  Same term structure as the mono loss, applied to the fine outputs (the
  coarse stage is frozen, reference model.py:106-118); the shipped reference
  has no FF train loop, so this mirrors the mono assembly at the stage the
  DynibarFF optimizer actually trains.
  """
  return _assemble_losses(
      ret["outputs_fine_ref"], ret["outputs_fine_ref_dy"],
      ret["outputs_fine_anchor"], ret["outputs_fine_anchor_dy"], rb, w)


def _assemble_losses(out_ref, out_ref_dy, out_anchor, out_anchor_dy,
                     rb: Dict[str, Any], w: LossWeights
                     ) -> Dict[str, jnp.ndarray]:
  gt_rgb = rb["rgb"]
  motion_mask = rb["motion_mask"].astype(jnp.float32)

  # --- RGB terms ---
  pred_mask = out_ref["mask"].astype(jnp.float32)
  rgb_loss = charbonnier_rgb(out_ref["rgb"], gt_rgb, pred_mask)
  rgb_loss += temporal_rgb_loss(out_anchor, gt_rgb)
  # early-phase dynamic-region supervision of the composite render
  dyn_mask = pred_mask * motion_mask
  rgb_loss += w.use_dynamic_mask_rgb * charbonnier_rgb(
      out_ref["rgb_dy"], gt_rgb, dyn_mask)
  # decayed dynamic-only terms
  rgb_loss += w.dynamic_rgb_decay * charbonnier_rgb(
      out_ref_dy["rgb"], gt_rgb,
      out_ref_dy["mask"].astype(jnp.float32) * motion_mask)
  rgb_loss += w.dynamic_rgb_decay * temporal_rgb_loss(
      out_anchor_dy, gt_rgb, motion_mask)

  # --- disparity ---
  if "disp" in rb:
    pred_disp = 1.0 / jnp.clip(out_ref["depth"], min=1e-2)
    disp_loss = w.w_disp * (
        jnp.sum(jnp.abs(pred_disp - rb["disp"]) * pred_mask)
        / (jnp.sum(pred_mask) + 1e-8))
  else:
    disp_loss = jnp.float32(0.0)

  # --- flow (render_flows may carry more views than the supervision; the
  # FF model renders 7 flows but GT flow pairs cover ±3 like mono) ---
  n_flow = rb["flows"].shape[0]
  fmask = pred_mask[None, :, None] * rb["flow_masks"]
  fl = w.w_flow * flow_loss(out_ref["render_flows"][:n_flow], rb["flows"],
                            fmask)

  # --- cycle consistency (pair-masked; reference train.py:354-371) ---
  occ_w = out_anchor["occ_weights"]                       # [R, S]
  pair_valid = out_anchor["pair_valid"].astype(jnp.float32)  # [Va]
  occ_w4 = (occ_w[None, :, :, None]
            * pair_valid[:, None, None, None])            # [Va,R,S,1]
  occ_w4 = jnp.broadcast_to(occ_w4, out_anchor["pts_traj_ref"].shape)
  cycle = w.w_cycle * (
      jnp.sum(jnp.abs(out_anchor["pts_traj_ref"]
                      - out_anchor["pts_traj_anchor"]) * occ_w4)
      / (jnp.sum(occ_w4) + 1e-8))

  # --- trajectory regularization (train.py:374-397) ---
  sf = out_anchor["sf_seq"]                               # [6, R, S, 3]
  reg = w.w_reg * jnp.mean(jnp.abs(sf))
  reg += w.w_reg * 0.5 * jnp.mean((sf[:-1] - sf[1:]) ** 2)
  reg += w.w_reg * jnp.mean(jnp.abs(sf[:, :, 1:, :] - sf[:, :, :-1, :]))

  # --- skew entropy on dynamic/static weight ratio (train.py:399-413) ---
  rw_dy = jnp.sum(out_ref["weights_dy"], axis=-1)
  rw_st = jnp.sum(out_ref["weights_st"], axis=-1)
  ratio = rw_dy / jnp.clip(rw_dy + rw_st, min=1e-9)
  # clamp before the logs: at ratio == 1.0 exactly (rw_st == 0, common in
  # FF scenes) XLA's fused rewrite of (1-r)*log(1-r+eps) yields NaN under
  # jit even though the eager value is 0
  r_ent = jnp.clip(ratio, 1e-9, 1.0 - 1e-7)
  ent = -(r_ent * jnp.log(r_ent)
          + (1.0 - r_ent) * jnp.log(1.0 - r_ent))
  entropy = w.w_skew_entropy * jnp.mean(ent)

  # --- distortion (train.py:416-423) ---
  s_vals = out_ref["s_vals"]
  mid = (s_vals[:, 1:] + s_vals[:, :-1]) * 0.5
  interval = s_vals[:, 1:] - s_vals[:, :-1]
  distortion = w.w_distortion * eff_distloss(
      out_ref["weights"][:, :-1], mid, interval)

  # --- adaptive static loss (train.py:426-445) ---
  st_mask = ((1.0 - rb["static_mask"].astype(jnp.float32)) * pred_mask
             * jax.lax.stop_gradient(1.0 - ratio))
  static_loss = charbonnier_rgb(out_ref["rgb_static"], gt_rgb, st_mask)
  sfm2 = jax.lax.stop_gradient(st_mask * (ratio < 0.1).astype(jnp.float32))
  static_loss += w.suppress_dynamic * (
      0.1 * jnp.sum(jnp.abs(rw_dy * sfm2)) / jnp.sum(sfm2 + 1e-8))

  total = (rgb_loss + cycle + fl + disp_loss + reg + entropy + distortion
           + static_loss)
  return {
      "loss": total,
      "rgb_loss": rgb_loss,
      "disp_loss": disp_loss,
      "flow_loss": fl,
      "cycle_loss": cycle,
      "reg_loss": reg,
      "entropy_loss": entropy,
      "distortion_loss": distortion,
      "static_loss": static_loss,
  }


def compute_bootstrap_loss(ret: Dict[str, Any], rb: Dict[str, Any]
                           ) -> jnp.ndarray:
  """Static-bootstrap phase loss (reference train.py:187-196)."""
  mask = ((1.0 - rb["static_mask"].astype(jnp.float32))
          * ret["outputs_coarse_ref"]["mask"].astype(jnp.float32))
  return charbonnier_rgb(ret["outputs_coarse_st"]["rgb"], rb["rgb"], mask)
