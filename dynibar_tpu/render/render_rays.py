"""The render core: one pure function per model family.

Rebuilds of the reference's hot loop (ibrnet/render_ray.py:870-1277
``render_rays_mono`` and :600-867 ``render_rays_mv``/``fine_render_rays``)
as fixed-shape jnp programs.  Key re-designs vs the torch original:

  * the 7-offset trajectory dictionary + python loops become one einsum
    against a dynamically-sliced basis window (core/motion.py);
  * ragged per-sample view lists become padded arrays + validity masks that
    fold into the projector's in-bounds mask — the aggregation math already
    multiplies by the mask, so padding slots contribute exactly zero;
  * cross-time (anchor) trajectory pair matching — a data-dependent python
    loop in the reference (render_ray.py:1149-1168) — becomes a static
    7-slot gather with a pair-validity mask consumed by the cycle loss;
  * everything runs under one jit; chunking happens outside (render_image).

The ray-batch dict contract (the system's universal currency, reference
sample_ray.py:19-47) is documented in ``dynibar_tpu/data/ray_batch.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.core import composite as comp
from dynibar_tpu.core import motion
from dynibar_tpu.core import projection as proj
from dynibar_tpu.core import sampling


def _normalize(v):
  return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _sampling_cast(cfg: RenderSettings, imgs, feats):
  """Prepare the sampling inputs.

  bf16 mode samples images/features in bf16 — halves the bytes moved by the
  gather, which dominates the render step (see ops/grid_sample.py);
  fused_rgb_sampling additionally bakes a 1/4-res RGB into the featmap's
  leading channels so one gather serves both (opt-in speed mode).
  Projection/masks stay f32; the aggregators consume bf16 anyway."""
  if cfg.compute_dtype == "bfloat16":
    imgs = imgs.astype(jnp.bfloat16)
    feats = feats.astype(jnp.bfloat16)
  if cfg.fused_rgb_sampling:
    v, hf, wf, _ = feats.shape
    small = jax.image.resize(
        imgs, (v, hf, wf, imgs.shape[-1]), "bilinear").astype(feats.dtype)
    feats = jnp.concatenate([small, feats], axis=-1)
  return imgs, feats


def _broadcast_time(t: jnp.ndarray, n_rays: int, n_samples: int):
  return jnp.broadcast_to(jnp.reshape(t, (1, 1, 1)), (n_rays, n_samples, 1))


def _agg_fns(model, cfg: RenderSettings, needs_grad: bool):
  """Aggregator dispatch: fused Pallas kernels (bf16 MXU passes) whenever
  the caller will NOT differentiate through the render; flax modules (or
  the Pallas primal + flax-derived backward, identical gradients) whenever
  it will.  The gate is *gradient need*, not is_train: the phase-1
  bootstrap step renders with is_train=False (no anchor branch) yet still
  calls jax.grad through outputs_coarse_st — routing it through the
  forward-only pallas_call kernels would fail at trace time (no VJP)."""
  if cfg.fused_aggregators and cfg.compute_dtype == "bfloat16":
    if not needs_grad:
      return model.apply_dy_fused, model.apply_st_fused
    if cfg.fused_aggregators_train:
      return model.apply_dy_fused_diff, model.apply_st_fused_diff
  return model.apply_dy, model.apply_st


def _cm_handoff(cfg: RenderSettings, needs_grad: bool) -> bool:
  """Layout-stable sampler->aggregator handoff eligibility: Pallas strip
  sampler + fused bf16 aggregators + no gradients (cfg.fused_handoff).
  The [R,S,V,3+C] interchange between the two kernels then never
  materializes — projections go channel-major straight into the
  aggregators' feature-major tiles (core/projection.compute_with_motions_cm)."""
  return (cfg.fused_handoff and not needs_grad
          and cfg.fused_aggregators and cfg.compute_dtype == "bfloat16"
          and cfg.strip_sampling and cfg.strip_impl == "pallas")


def _aggregate_cm(pts, input_ray_dir, time_emb, rb, d_dy, d_st,
                  apply_dy, apply_st):
  """Invoke both fused aggregators on channel-major projections.

  apply_dy/apply_st are the models' fused applies, partially applied over
  params and any stage argument; d_dy/d_st are compute_with_motions_cm
  outputs."""
  r, s = pts.shape[:2]
  v_dy, c_dy = d_dy["rgbfeat_cm"].shape[:2]
  pv_dy = jnp.concatenate([d_dy["rgbfeat_cm"], d_dy["mask_cm"]], axis=1)
  raw_dy = apply_dy(pts, None, input_ray_dir, None, None, None, time_emb,
                    pv_cm=pv_dy, shape=(r, s, v_dy, c_dy))
  ref_pl = proj.ref_plucker(rb["ray_o"], rb["ray_d"])
  src_pl_cm = proj.src_plucker_cm(pts, rb["static_src_cameras"])
  v_st, c_st = d_st["rgbfeat_cm"].shape[:2]
  pv_st = jnp.concatenate([d_st["rgbfeat_cm"], d_st["raydiff_cm"],
                           d_st["mask_cm"]], axis=1)
  raw_st = apply_st(pts, ref_pl, None, None, input_ray_dir, None, None,
                    pv_cm=pv_st, src_pl_cm=src_pl_cm,
                    shape=(r, s, v_st, c_st))
  return raw_dy, raw_st


def _strip_arg(cfg: RenderSettings, needs_grad: bool = False):
  """Epipolar-strip extents for the featmap lookup, or None.

  Gradient-bearing steps ALWAYS keep the per-sample gather: its custom
  VJP (ops/grid_sample.py) is what makes the backward fast, and the
  round-4 post-mortem (DESIGN.md §3) showed the windowed sampler is
  unsound under gradients — it silently censors exactly the samples
  carrying the largest motion-field restoring gradients."""
  if cfg.strip_sampling and not needs_grad:
    return (cfg.strip_rows, cfg.strip_cols)
  return None


def _motion_window(apply_motion, basis, pts, time_emb, frame_idx, n_samples,
                   window):
  """MotionMLP -> tail-zeroed coeffs -> trajectory points at all offsets."""
  xyzt = jnp.concatenate([pts, time_emb], axis=-1)
  raw_coeff = apply_motion(xyzt)                       # [R, S, 3K]
  raw_coeff = motion.zero_tail_coeffs(raw_coeff, n_samples)
  basis_win = motion.basis_window(basis, frame_idx, window)  # [O, K]
  return motion.traj_points_window(raw_coeff, basis_win)     # [R, S, O, 3]


def render_rays_mono(
    model,
    params,
    rb: Dict[str, Any],
    featmaps: Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray],
    cfg: RenderSettings,
    *,
    is_train: bool,
    det: bool,
    rng: Optional[jax.Array] = None,
    cov_out: Optional[list] = None,
    needs_grad: Optional[bool] = None,
) -> Dict[str, Any]:
  """Monocular-model forward for a batch of rays.

  Args:
    model: MonoModel (module definitions).
    params: parameter pytree (incl. 'traj_basis').
    rb: ray-batch dict (see data/ray_batch.py).
    featmaps: (dy_featmaps [Vd,Hf,Wf,C], anchor_featmaps [Va,Hf,Wf,C] or
      None when not training, static_featmaps [Vs,Hf,Wf,C]).
    cfg: static render settings.
    is_train / det: compile-time flags (select program structure).
    rng: PRNG key for stratified sampling (required when det=False).

  Returns dict with outputs_coarse_ref / outputs_coarse_ref_dy /
  outputs_coarse_st and, in training, outputs_coarse_anchor(+_dy) with the
  occlusion weights, matched trajectory pairs and scene-flow sequence the
  loss needs.
  """
  w = cfg.traj_window
  s = cfg.n_samples
  if needs_grad is None:
    needs_grad = is_train
  input_ray_dir = _normalize(rb["ray_d"])

  if rng is not None:
    rng_strat, rng = jax.random.split(rng)
  else:
    rng_strat = None
  pts_ref, z_vals, s_vals = sampling.sample_along_ray(
      rb["ray_o"], rb["ray_d"], rb["depth_range"], s,
      inv_uniform=cfg.inv_uniform, det=det, rng=rng_strat)
  n_rays = pts_ref.shape[0]

  ref_time_emb = _broadcast_time(rb["ref_time"], n_rays, s)
  traj_ref = _motion_window(
      lambda x: model.apply_motion(params, x), params["traj_basis"],
      pts_ref, ref_time_emb, rb["ref_frame_idx"], s, w)        # [R,S,O,3]

  pts_3d_seq_ref = motion.displaced_points(
      pts_ref, traj_ref, rb["src_offset_idx"], w)              # [Vd,R,S,3]
  pts_3d_static = jnp.broadcast_to(
      pts_ref[None], (cfg.num_views_static,) + pts_ref.shape)

  src_imgs, src_feats = _sampling_cast(cfg, rb["src_rgbs"], featmaps[0])
  st_imgs, st_feats = _sampling_cast(cfg, rb["static_src_rgbs"], featmaps[2])
  apply_dy, apply_st = _agg_fns(model, cfg, needs_grad)
  if _cm_handoff(cfg, needs_grad):
    d_dy = proj.compute_with_motions_cm(
        pts_ref, pts_3d_seq_ref, rb["camera"], src_imgs,
        rb["src_cameras"], src_feats, rb["src_valid"],
        fused_rgb=cfg.fused_rgb_sampling, cov_out=cov_out)
    d_st = proj.compute_with_motions_cm(
        pts_ref, pts_3d_static, rb["camera"], st_imgs,
        rb["static_src_cameras"], st_feats, rb["static_valid"],
        fused_rgb=cfg.fused_rgb_sampling, cov_out=cov_out)
    pixel_mask_ref, pixel_mask_st = d_dy["pixel_mask"], d_st["pixel_mask"]
    raw_dy, raw_st = _aggregate_cm(
        pts_ref, input_ray_dir, ref_time_emb, rb, d_dy, d_st,
        lambda *a, **k: apply_dy(params, *a, **k),
        lambda *a, **k: apply_st(params, *a, **k))
  else:
    strip = _strip_arg(cfg, needs_grad)
    rgb_feat_ref, ray_diff_ref, mask_ref = proj.compute_with_motions(
        pts_ref, pts_3d_seq_ref, rb["camera"], src_imgs,
        rb["src_cameras"], src_feats, rb["src_valid"],
        fused_rgb=cfg.fused_rgb_sampling, strip=strip,
        strip_impl=cfg.strip_impl, cov_out=cov_out)
    rgb_feat_st, ray_diff_st, mask_st = proj.compute_with_motions(
        pts_ref, pts_3d_static, rb["camera"], st_imgs,
        rb["static_src_cameras"], st_feats, rb["static_valid"],
        fused_rgb=cfg.fused_rgb_sampling, strip=strip,
        strip_impl=cfg.strip_impl, cov_out=cov_out)

    pixel_mask_ref = jnp.sum(mask_ref[..., 0], axis=2) > 1     # [R,S]
    pixel_mask_st = jnp.sum(mask_st[..., 0], axis=2) > 1

    time_diff = jnp.zeros(ray_diff_ref.shape[:3] + (1,))  # unused by net

    raw_dy = apply_dy(
        params, pts_ref, rgb_feat_ref, input_ray_dir, ray_diff_ref,
        time_diff, mask_ref, ref_time_emb)                     # [R,S,4]

    ref_pl = proj.ref_plucker(rb["ray_o"], rb["ray_d"])
    src_pl = proj.src_plucker(pts_ref, rb["static_src_cameras"])
    raw_st = apply_st(
        params, pts_ref, ref_pl, src_pl, rgb_feat_st, input_ray_dir,
        ray_diff_st, mask_st)

  outputs_ref = comp.composite_dual(raw_dy, raw_st, z_vals,
                                    pixel_mask_ref, pixel_mask_st)
  outputs_st = comp.composite_single(raw_st, z_vals, pixel_mask_st)
  outputs_ref_dy = comp.composite_single(raw_dy, z_vals, pixel_mask_ref)

  # render-derived optical flow against the first 6 (temporal) source views
  outputs_ref["render_flows"] = comp.render_optical_flow(
      outputs_ref["weights"], pts_3d_seq_ref[:6], rb["src_cameras"][:6],
      rb["uv_grid"])
  outputs_ref["s_vals"] = s_vals
  outputs_ref["exp_sf"] = jax.lax.stop_gradient(
      motion.expected_scene_flow(outputs_ref["weights"], traj_ref, 1, w))

  ret: Dict[str, Any] = {
      "outputs_coarse_ref": outputs_ref,
      "outputs_coarse_ref_dy": outputs_ref_dy,
      "outputs_coarse_st": outputs_st,
  }

  if not is_train:
    return ret

  outputs_anchor, outputs_anchor_dy = _cross_time_branch(
      rb, cfg,
      pts_ref=pts_ref, traj_ref=traj_ref, z_vals=z_vals, raw_st=raw_st,
      outputs_ref=outputs_ref, outputs_ref_dy=outputs_ref_dy,
      pixel_mask_st=pixel_mask_st, input_ray_dir=input_ray_dir,
      apply_dy=lambda *a: apply_dy(params, *a),
      apply_motion=lambda x: model.apply_motion(params, x),
      basis=params["traj_basis"], anchor_featmaps=featmaps[1],
      strip=_strip_arg(cfg, needs_grad))

  ret["outputs_coarse_anchor"] = outputs_anchor
  ret["outputs_coarse_anchor_dy"] = outputs_anchor_dy
  return ret


def _cross_time_branch(rb, cfg: RenderSettings, *, pts_ref, traj_ref, z_vals,
                       raw_st, outputs_ref, outputs_ref_dy, pixel_mask_st,
                       input_ray_dir, apply_dy, apply_motion, basis,
                       anchor_featmaps, strip):
  """Cross-time (anchor) rendering for temporal consistency.

  Rebuild of reference render_ray.py:1099-1270 as a fixed-shape program,
  shared by the mono coarse stage and (as an extension the shipped reference
  lacks — its ``fine_render_rays`` accepts ``is_train`` but always returns
  ``outputs_anchor = None``, render_ray.py:583-584) the FF fine stage.

  Returns (outputs_anchor, outputs_anchor_dy) with the occlusion weights,
  matched trajectory pairs and scene-flow sequence the loss consumes.
  """
  w = cfg.traj_window
  n_rays, s = pts_ref.shape[:2]
  delta = rb["anchor_frame_idx"] - rb["ref_frame_idx"]         # in [-w, w]
  sf_seq = motion.scene_flow_seq(traj_ref)                     # [2w, R, S, 3]

  # displace reference points to the anchor time along their trajectory
  traj_at_delta = jnp.take(traj_ref, (delta + w).astype(jnp.int32), axis=2)
  pts_anchor = pts_ref + traj_at_delta - traj_ref[:, :, w, :]

  anchor_time_emb = _broadcast_time(rb["anchor_time"], n_rays, s)
  traj_anchor = _motion_window(
      apply_motion, basis, pts_anchor, anchor_time_emb,
      rb["anchor_frame_idx"], s, w)

  pts_3d_seq_anchor = motion.displaced_points(
      pts_anchor, traj_anchor, rb["anchor_offset_idx"], w)     # [Va,R,S,3]

  # matched trajectory pairs for the cycle loss: for each real anchor view
  # at offset o, the reference-time twin sits at offset delta + o
  off_a = rb["anchor_offset_idx"].astype(jnp.int32) - w        # [Va]
  ref_off_idx = delta + off_a + w                              # [Va]
  pair_valid = ((rb["anchor_valid"] > 0)
                & (rb["anchor_is_vv"] < 1)
                & (ref_off_idx >= 0) & (ref_off_idx <= 2 * w))
  ref_off_idx = jnp.clip(ref_off_idx, 0, 2 * w)
  traj_ref_sel = jnp.take(traj_ref, ref_off_idx, axis=2)       # [R,S,Va,3]
  pts_traj_ref = (jnp.transpose(
      traj_ref_sel - traj_ref[:, :, w:w + 1, :], (2, 0, 1, 3))
      + pts_ref[None])                                         # [Va,R,S,3]
  pts_traj_anchor = pts_3d_seq_anchor

  a_imgs, a_feats = _sampling_cast(cfg, rb["anchor_src_rgbs"],
                                   anchor_featmaps)
  rgb_feat_anchor, ray_diff_anchor, mask_anchor = proj.compute_with_motions(
      pts_ref, pts_3d_seq_anchor, rb["camera"], a_imgs,
      rb["anchor_src_cameras"], a_feats, rb["anchor_valid"],
      fused_rgb=cfg.fused_rgb_sampling, strip=strip,
      strip_impl=cfg.strip_impl)
  # anchor pixel mask uses > 0 (reference render_ray.py:1198-1200)
  pixel_mask_anchor = jnp.sum(mask_anchor[..., 0], axis=2) > 0

  time_diff_a = jnp.zeros(ray_diff_anchor.shape[:3] + (1,))
  raw_anchor = apply_dy(
      pts_anchor, rgb_feat_anchor, input_ray_dir, ray_diff_anchor,
      time_diff_a, mask_anchor, anchor_time_emb)

  outputs_anchor = comp.composite_dual(raw_anchor, raw_st, z_vals,
                                       pixel_mask_anchor, pixel_mask_st)
  outputs_anchor_dy = comp.composite_single(raw_anchor, z_vals,
                                            pixel_mask_anchor)

  occ_score_dy = jax.lax.stop_gradient(
      outputs_ref_dy["weights"] - outputs_anchor_dy["weights"])
  outputs_anchor_dy["occ_weights"] = 1.0 - jnp.abs(occ_score_dy)
  outputs_anchor_dy["occ_weight_map"] = (
      1.0 - jnp.abs(jnp.sum(occ_score_dy, axis=1)))

  # disocclusion weights (reference render_ray.py:1232-1257)
  diff_dy = outputs_ref["weights_dy"] - outputs_anchor["weights_dy"]
  diff_full = outputs_ref["weights"] - outputs_anchor["weights"]
  if cfg.occ_weights_mode == 0:     # mix: dy-composite unless |Δt| <= 1
    occ_score = jnp.where(jnp.abs(delta) > 1, diff_dy, diff_full)
  elif cfg.occ_weights_mode == 1:   # composite-dy
    occ_score = diff_dy
  elif cfg.occ_weights_mode == 2:   # full
    occ_score = diff_full
  else:
    raise NotImplementedError(cfg.occ_weights_mode)
  occ_score = jax.lax.stop_gradient(occ_score)

  outputs_anchor["occ_weights"] = 1.0 - jnp.abs(occ_score)
  outputs_anchor["occ_weight_map"] = (
      1.0 - jnp.abs(jnp.sum(occ_score, axis=1)))
  outputs_anchor["pts_traj_ref"] = pts_traj_ref
  outputs_anchor["pts_traj_anchor"] = pts_traj_anchor
  outputs_anchor["pair_valid"] = pair_valid
  outputs_anchor["sf_seq"] = sf_seq
  return outputs_anchor, outputs_anchor_dy


def _render_stage_ff(model, params, rb, featmaps, cfg, stage, pts, z_vals,
                     s_vals, input_ray_dir, num_frames, cov_out=None,
                     needs_grad=False):
  """Shared coarse/fine forward of the forward-facing model
  (reference fine_render_rays, render_ray.py:407-597)."""
  w = cfg.traj_window
  n_rays, s = pts.shape[:2]
  time_emb = _broadcast_time(rb["ref_time"], n_rays, s)
  basis = params["traj_basis_fine" if stage == "fine" else "traj_basis"]
  traj = _motion_window(
      lambda x: model.apply_motion(params, stage, x), basis,
      pts, time_emb, rb["ref_frame_idx"], s, w)

  pts_seq = motion.displaced_points(pts, traj, rb["src_offset_idx"], w)
  pts_static = jnp.broadcast_to(
      pts[None], (cfg.num_views_static,) + pts.shape)

  src_imgs, src_feats = _sampling_cast(cfg, rb["src_rgbs"], featmaps[0])
  st_imgs, st_feats = _sampling_cast(cfg, rb["static_src_rgbs"], featmaps[2])
  apply_dy, apply_st = _agg_fns(model, cfg, needs_grad)
  if _cm_handoff(cfg, needs_grad):
    d_dy = proj.compute_with_motions_cm(
        pts, pts_seq, rb["camera"], src_imgs, rb["src_cameras"],
        src_feats, rb["src_valid"], fused_rgb=cfg.fused_rgb_sampling,
        cov_out=cov_out)
    d_st = proj.compute_with_motions_cm(
        pts, pts_static, rb["camera"], st_imgs,
        rb["static_src_cameras"], st_feats, rb["static_valid"],
        fused_rgb=cfg.fused_rgb_sampling, cov_out=cov_out)
    pixel_mask, pixel_mask_st = d_dy["pixel_mask"], d_st["pixel_mask"]
    raw_dy, raw_st = _aggregate_cm(
        pts, input_ray_dir, time_emb, rb, d_dy, d_st,
        lambda *a, **k: apply_dy(params, stage, *a, **k),
        lambda *a, **k: apply_st(params, stage, *a, **k))
  else:
    strip = _strip_arg(cfg, needs_grad)
    rgb_feat, ray_diff, mask = proj.compute_with_motions(
        pts, pts_seq, rb["camera"], src_imgs, rb["src_cameras"],
        src_feats, rb["src_valid"], fused_rgb=cfg.fused_rgb_sampling,
        strip=strip, strip_impl=cfg.strip_impl, cov_out=cov_out)
    rgb_feat_st, ray_diff_st, mask_st = proj.compute_with_motions(
        pts, pts_static, rb["camera"], st_imgs,
        rb["static_src_cameras"], st_feats, rb["static_valid"],
        fused_rgb=cfg.fused_rgb_sampling, strip=strip,
        strip_impl=cfg.strip_impl, cov_out=cov_out)

    pixel_mask = jnp.sum(mask[..., 0], axis=2) > 1
    pixel_mask_st = jnp.sum(mask_st[..., 0], axis=2) > 1

    # normalized time offsets (reference render_ray.py:531-535; unused by
    # the dynamic net but kept for interface parity)
    time_diff = jnp.zeros(ray_diff.shape[:3] + (1,))

    raw_dy = apply_dy(params, stage, pts, rgb_feat, input_ray_dir,
                      ray_diff, time_diff, mask, time_emb)
    ref_pl = proj.ref_plucker(rb["ray_o"], rb["ray_d"])
    src_pl = proj.src_plucker(pts, rb["static_src_cameras"])
    raw_st = apply_st(params, stage, pts, ref_pl, src_pl, rgb_feat_st,
                      input_ray_dir, ray_diff_st, mask_st)

  outputs = comp.composite_dual(raw_dy, raw_st, z_vals, pixel_mask,
                                pixel_mask_st)
  outputs_dy = comp.composite_single(raw_dy, z_vals, pixel_mask)
  return outputs, outputs_dy, traj, pts_seq, raw_st, pixel_mask_st


def render_rays_mv(
    model,
    params,
    rb: Dict[str, Any],
    coarse_featmaps,
    fine_featmaps,
    cfg: RenderSettings,
    *,
    det: bool = True,
    is_train: bool = False,
    rng: Optional[jax.Array] = None,
    cov_out: Optional[list] = None,
    needs_grad: Optional[bool] = None,
) -> Dict[str, Any]:
  """Coarse→fine forward of the forward-facing (Nvidia benchmark) model
  (reference render_rays_mv, render_ray.py:600-867).

  is_train=True adds the fine-stage cross-time (anchor) branch for the
  temporal-consistency losses.  Note this *extends* the shipped reference:
  its ``fine_render_rays`` accepts ``is_train`` but unconditionally returns
  ``outputs_anchor = None`` (render_ray.py:583-584), and no FF train driver
  exists upstream — the branch here mirrors the mono coarse-stage cross-time
  logic (render_ray.py:1099-1270) at the fine stage, which is what the
  DynibarFF optimizer layout (model.py:106-118) implies was trained.
  """
  w = cfg.traj_window
  if needs_grad is None:
    needs_grad = is_train
  input_ray_dir = _normalize(rb["ray_d"])

  keys = jax.random.split(rng, 3) if rng is not None else (None, None, None)
  pts_ref, z_vals, _ = sampling.sample_along_ray(
      rb["ray_o"], rb["ray_d"], rb["depth_range"], cfg.n_samples,
      inv_uniform=cfg.inv_uniform, det=det, rng=keys[0])

  # coarse stage is frozen (reference runs it under torch.no_grad,
  # render_ray.py:672); stop_gradient on the *params* keeps the whole coarse
  # program out of the differentiated path, so it can keep the fused
  # forward-only kernels even inside a jax.grad train step
  params_coarse = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
  outputs_coarse, _, _, _, _, _ = _render_stage_ff(
      model, params_coarse, rb, coarse_featmaps, cfg, "coarse", pts_ref,
      z_vals, None, input_ray_dir, model.num_frames, cov_out=cov_out)
  outputs_coarse = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                          outputs_coarse)

  assert cfg.n_importance > 0
  z_all = sampling.importance_resample_z(
      z_vals, outputs_coarse["weights"], cfg.n_importance,
      inv_uniform=cfg.inv_uniform, det=det, rng=keys[1])
  near, far = rb["depth_range"][0], rb["depth_range"][1]
  s_all = sampling.z_to_s(z_all, near, far)
  pts_fine = (z_all[..., None] * rb["ray_d"][:, None, :]
              + rb["ray_o"][:, None, :])

  (outputs_fine, outputs_fine_dy, traj_fine, pts_seq_fine, raw_st_fine,
   pixel_mask_st_fine) = _render_stage_ff(
      model, params, rb, fine_featmaps, cfg, "fine", pts_fine, z_all, s_all,
      input_ray_dir, model.num_frames, cov_out=cov_out,
      needs_grad=needs_grad)

  outputs_fine["render_flows"] = comp.render_optical_flow(
      outputs_fine["weights"], pts_seq_fine, rb["src_cameras"],
      rb["uv_grid"])
  outputs_fine["s_vals"] = s_all
  outputs_fine["exp_sf"] = motion.expected_scene_flow(
      outputs_fine["weights"], traj_fine, 2, w)

  ret = {
      "outputs_coarse_ref": outputs_coarse,
      "outputs_fine_ref": outputs_fine,
      "outputs_fine_ref_dy": outputs_fine_dy,
      "outputs_fine_anchor": None,
      "outputs_fine_anchor_dy": None,
  }
  if not is_train:
    return ret

  apply_dy, _ = _agg_fns(model, cfg, needs_grad)
  outputs_anchor, outputs_anchor_dy = _cross_time_branch(
      rb, cfg,
      pts_ref=pts_fine, traj_ref=traj_fine, z_vals=z_all,
      raw_st=raw_st_fine, outputs_ref=outputs_fine,
      outputs_ref_dy=outputs_fine_dy, pixel_mask_st=pixel_mask_st_fine,
      input_ray_dir=input_ray_dir,
      apply_dy=lambda *a: apply_dy(params, "fine", *a),
      apply_motion=lambda x: model.apply_motion(params, "fine", x),
      basis=params["traj_basis_fine"],
      anchor_featmaps=fine_featmaps[1],
      strip=_strip_arg(cfg, needs_grad))
  ret["outputs_fine_anchor"] = outputs_anchor
  ret["outputs_fine_anchor_dy"] = outputs_anchor_dy
  return ret


def render_rays_ff_coarse(
    model,
    params,
    rb: Dict[str, Any],
    coarse_featmaps,
    cfg: RenderSettings,
    *,
    det: bool = False,
    is_train: bool = True,
    rng: Optional[jax.Array] = None,
    cov_out: Optional[list] = None,
    needs_grad: Optional[bool] = None,
) -> Dict[str, Any]:
  """Standalone COARSE-stage forward of the forward-facing model, for
  training the frozen-coarse checkpoint DynibarFF's fine stage loads.

  The reference ships per-scene coarse checkpoints (``coarse_dir``,
  model.py:102) but no code that produces them; its fine-stage eval routing
  (eval_nvidia.py:335-358: coarse dynamic <- feature_net coarse channels,
  coarse static <- feature_net FINE channels) rules out grafting a
  mono-trained coarse stage (the mono model routes static features through
  its separate feature_net_st, so feature_net's fine channels would be
  untrained).  This program trains the FF coarse nets directly: a
  single-stage render structured like render_rays_mono's (uniform samples,
  dual composite, mono-style cross-time anchor branch at the coarse nets),
  returning the key layout compute_mono_losses consumes.
  """
  w = cfg.traj_window
  if needs_grad is None:
    needs_grad = is_train
  input_ray_dir = _normalize(rb["ray_d"])
  key0 = None
  if rng is not None:
    key0, rng = jax.random.split(rng)
  pts_ref, z_vals, s_vals = sampling.sample_along_ray(
      rb["ray_o"], rb["ray_d"], rb["depth_range"], cfg.n_samples,
      inv_uniform=cfg.inv_uniform, det=det, rng=key0)

  (outputs_ref, outputs_ref_dy, traj_ref, pts_seq, raw_st,
   pixel_mask_st) = _render_stage_ff(
      model, params, rb, coarse_featmaps, cfg, "coarse", pts_ref, z_vals,
      s_vals, input_ray_dir, model.num_frames, cov_out=cov_out,
      needs_grad=needs_grad)

  outputs_ref["render_flows"] = comp.render_optical_flow(
      outputs_ref["weights"], pts_seq, rb["src_cameras"], rb["uv_grid"])
  outputs_ref["s_vals"] = s_vals
  outputs_ref["exp_sf"] = jax.lax.stop_gradient(
      motion.expected_scene_flow(outputs_ref["weights"], traj_ref, 2, w))

  ret: Dict[str, Any] = {
      "outputs_coarse_ref": outputs_ref,
      "outputs_coarse_ref_dy": outputs_ref_dy,
  }
  if not is_train:
    return ret

  apply_dy, _ = _agg_fns(model, cfg, needs_grad)
  outputs_anchor, outputs_anchor_dy = _cross_time_branch(
      rb, cfg,
      pts_ref=pts_ref, traj_ref=traj_ref, z_vals=z_vals, raw_st=raw_st,
      outputs_ref=outputs_ref, outputs_ref_dy=outputs_ref_dy,
      pixel_mask_st=pixel_mask_st, input_ray_dir=input_ray_dir,
      apply_dy=lambda *a: apply_dy(params, "coarse", *a),
      apply_motion=lambda x: model.apply_motion(params, "coarse", x),
      basis=params["traj_basis"],
      anchor_featmaps=coarse_featmaps[1],
      strip=_strip_arg(cfg, needs_grad))
  ret["outputs_coarse_anchor"] = outputs_anchor
  ret["outputs_coarse_anchor_dy"] = outputs_anchor_dy
  return ret
