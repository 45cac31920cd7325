"""IBR view-aggregation networks (the per-sample color/density heads).

Rebuilds of the reference's ``DynibarDynamic`` (ibrnet/mlp_network.py:129-316)
and ``DynibarStatic`` (:319-527): weighted mean/variance pooling over source
views, visibility-weighted re-pooling, a ray transformer along the sample
axis, and either a direct MLP RGB decode (dynamic) or softmax blending
weights over source-view colors (static).

Everything is expressed as dense [rays, samples, views, features] tensor work
— exactly the shape XLA tiles onto the MXU; no per-view python loops.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynibar_tpu.core.posenc import periodic_embed, sample_axis_posenc
from dynibar_tpu.models.attention import RayTransformer
from dynibar_tpu.models.nn_layers import MLP, TorchDense


def weighted_mean_variance(x: jnp.ndarray, weight: jnp.ndarray):
  """fused_mean_variance (reference mlp_network.py:115-119), view axis=2."""
  mean = jnp.sum(x * weight, axis=2, keepdims=True)
  var = jnp.sum(weight * (x - mean) ** 2, axis=2, keepdims=True)
  return mean, var


def _masked_view_weights(mask: jnp.ndarray) -> jnp.ndarray:
  return mask / (jnp.sum(mask, axis=2, keepdims=True) + 1e-8)


def _anti_alias_weights(ray_diff: jnp.ndarray, mask: jnp.ndarray,
                        s: jnp.ndarray) -> jnp.ndarray:
  """Anti-alias pooling weights (reference mlp_network.py:461-467)."""
  dot = ray_diff[..., 3:4]
  exp_dot = jnp.exp(jnp.abs(s) * (dot - 1.0))
  w = (exp_dot - jnp.min(exp_dot, axis=2, keepdims=True)) * mask
  return w / (jnp.sum(w, axis=2, keepdims=True) + 1e-8)


class _VisPooling(nn.Module):
  """Shared trunk: base_fc -> visibility gating -> re-pooled global feature.

  Covers reference mlp_network.py:270-283 / :483-496 (identical in both
  aggregators).  Returns (x [R,S,V,128], vis [R,S,V,1], globalfeat [R,S,128],
  weight [R,S,V,1]).
  """

  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, rgb_feat, weight, mask):
    mean, var = weighted_mean_variance(rgb_feat, weight)
    globalfeat = jnp.concatenate([mean, var], axis=-1)
    num_views = rgb_feat.shape[2]
    x = jnp.concatenate(
        [jnp.broadcast_to(globalfeat,
                          globalfeat.shape[:2] + (num_views,)
                          + globalfeat.shape[3:]),
         rgb_feat], axis=-1)
    x = MLP((256, 128), activate_final=True, dtype=self.dtype,
            name="base_fc")(x)

    x_vis = MLP((128, 129), activate_final=True, dtype=self.dtype,
                name="vis_fc")(x * weight)
    x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
    vis = jax.nn.sigmoid(vis) * mask
    x = x + x_res
    vis_h = MLP((128, 1), dtype=self.dtype, name="vis_fc2")(x * vis)
    vis = jax.nn.sigmoid(vis_h) * mask
    weight = vis / (jnp.sum(vis, axis=2, keepdims=True) + 1e-8)

    mean, var = weighted_mean_variance(x, weight)
    globalfeat = jnp.concatenate(
        [mean[:, :, 0], var[:, :, 0], jnp.mean(weight, axis=2)], axis=-1)
    globalfeat = MLP((256, 128), activate_final=True, dtype=self.dtype,
                     name="geometry_fc")(globalfeat)
    return x, vis, globalfeat, weight


class DynamicAggregator(nn.Module):
  """Time-varying dynamic model (reference DynibarDynamic)."""

  in_feat_ch: int = 32
  n_samples: int = 64
  shift: float = 0.0
  anti_alias_pooling: bool = False  # reference hard-codes False (:135)
  compute_dtype: Optional[Any] = None  # bf16 mixed-precision mode

  @nn.compact
  def __call__(self, pts_xyz, rgb_feat, glb_ray_dir, ray_diff, time_diff,
               mask, time):
    """All shapes [R, S, V, ·] except pts_xyz [R,S,3], glb_ray_dir [R,3],
    time [R,S,1].  time_diff accepted for parity but unused (the reference
    forward never reads it)."""
    del time_diff
    num_views = rgb_feat.shape[2]
    if self.compute_dtype is not None:
      rgb_feat = rgb_feat.astype(self.compute_dtype)
      mask = mask.astype(self.compute_dtype)

    time_pe = periodic_embed(time, max_freq=10, n_freq=10, linspace=False)
    if self.compute_dtype is not None:
      time_pe = time_pe.astype(self.compute_dtype)
    # ray_dir_fc's input is broadcast over the view axis (reference
    # mlp_network.py:240-247 applies the MLP *after* expanding to
    # [R,S,V,·]); MLP(broadcast(x)) == broadcast(MLP(x)), so run it on
    # [R,S,·] and expand the 35-dim output — V× less matmul work.
    direction_feat = MLP((256, self.in_feat_ch + 3), activate_final=True,
                         dtype=self.compute_dtype, name="ray_dir_fc")(time_pe)
    rgb_feat = rgb_feat + direction_feat[:, :, None, :]

    weight = _masked_view_weights(mask)

    x, vis, globalfeat, weight = _VisPooling(
        dtype=self.compute_dtype, name="vis_pooling")(rgb_feat, weight, mask)
    num_valid_obs = jnp.sum(mask.astype(jnp.float32), axis=2)    # [R,S,1]

    globalfeat = globalfeat + jnp.asarray(
        sample_axis_posenc(128, self.n_samples)).astype(globalfeat.dtype)[None]
    globalfeat = RayTransformer(dtype=self.compute_dtype,
                                name="ray_attention")(
        globalfeat, globalfeat, globalfeat,
        mask=(num_valid_obs > 1).astype(jnp.float32))

    pts_pe = periodic_embed(pts_xyz, max_freq=5, n_freq=5, linspace=False)
    pts_pe = pts_pe.astype(globalfeat.dtype)
    globalfeat = MLP((256, 128), activate_final=True,
                     dtype=self.compute_dtype, name="ref_pts_fc")(
        jnp.concatenate([globalfeat, pts_pe], axis=-1))

    sigma = (MLP((128, 1), dtype=self.compute_dtype,
                 name="out_geometry_fc")(globalfeat).astype(jnp.float32)
             - self.shift)
    sigma = jnp.where(num_valid_obs < 1, -1e9, sigma)            # [R,S,1]

    dir_pe = periodic_embed(glb_ray_dir, max_freq=4, n_freq=4, linspace=False)
    dir_pe = dir_pe.astype(globalfeat.dtype)
    dir_pe = jnp.broadcast_to(dir_pe[:, None, :],
                              (dir_pe.shape[0], globalfeat.shape[1],
                               dir_pe.shape[-1]))
    h = jnp.concatenate([globalfeat, dir_pe], axis=-1)
    rgb = jax.nn.sigmoid(
        MLP((128, 64, 3), dtype=self.compute_dtype,
            name="rgb_fc")(h)).astype(jnp.float32)
    any_view = jnp.sum(mask.astype(jnp.float32), axis=2) > 0     # [R,S,1]
    rgb = jnp.where(any_view, rgb, 0.0)
    return jnp.concatenate([rgb, sigma], axis=-1)


class StaticAggregator(nn.Module):
  """Time-invariant static model (reference DynibarStatic)."""

  in_feat_ch: int = 32
  n_samples: int = 64
  anti_alias_pooling: bool = True
  mask_rgb: bool = True
  compute_dtype: Optional[Any] = None  # bf16 mixed-precision mode

  @nn.compact
  def __call__(self, pts, ref_rays_coords, src_rays_coords, rgb_feat,
               glb_ray_dir, ray_diff, mask):
    """pts [R,S,3]; ref_rays_coords [R,6]; src_rays_coords [R,S,V,6];
    rgb_feat [R,S,V,3+C]; ray_diff [R,S,V,4]; mask [R,S,V,1]."""
    del glb_ray_dir  # accepted for parity; reference never reads it
    r, s, num_views = rgb_feat.shape[:3]
    dt = self.compute_dtype

    ref_rays_pe = periodic_embed(ref_rays_coords, max_freq=5, n_freq=5,
                                 linspace=False)                 # [R, 66]
    src_rays_pe = periodic_embed(src_rays_coords, max_freq=5, n_freq=5,
                                 linspace=False)                 # [R,S,V,66]
    pts_pe = periodic_embed(pts, max_freq=5, n_freq=5,
                            linspace=False)                      # [R,S,33]
    if dt is not None:
      ref_rays_pe = ref_rays_pe.astype(dt)
      src_rays_pe = src_rays_pe.astype(dt)
      pts_pe = pts_pe.astype(dt)
      rgb_feat = rgb_feat.astype(dt)
      ray_diff = ray_diff.astype(dt)
      mask = mask.astype(dt)

    src_features = jnp.concatenate(
        [jnp.broadcast_to(pts_pe[:, :, None, :],
                          (r, s, num_views, pts_pe.shape[-1])),
         src_rays_pe], axis=-1)

    src_feat = MLP((256, self.in_feat_ch + 3), dtype=dt, name="ray_dir_fc")(
        jnp.concatenate([src_features, ray_diff], axis=-1))
    # ref_feature_fc's input is the per-ray Plücker PE broadcast over
    # samples and views (reference mlp_network.py:434-447);
    # Dense(broadcast(x)) == broadcast(Dense(x)) — run it on [R,66] and
    # expand the 35-dim output.
    ref_feat = TorchDense(self.in_feat_ch + 3, dtype=dt,
                          name="ref_feature_fc")(ref_rays_pe)[:, None, None, :]

    rgb_in = rgb_feat[..., :3]
    if self.mask_rgb:
      # zero out contributions from black (masked-out) source pixels
      rgb_mask = jax.lax.stop_gradient(
          (jnp.sum(rgb_in, axis=-1, keepdims=True) > 1e-3)
          .astype(mask.dtype))
      mask = mask * rgb_mask

    rgb_feat = jnp.concatenate([rgb_feat, src_feat * ref_feat], axis=-1)

    if self.anti_alias_pooling:
      s_param = self.param("s", nn.initializers.constant(0.2), ())
      weight = _anti_alias_weights(ray_diff, mask,
                                   s_param.astype(ray_diff.dtype))
    else:
      weight = _masked_view_weights(mask)

    x, vis, globalfeat, weight = _VisPooling(
        dtype=dt, name="vis_pooling")(rgb_feat, weight, mask)
    num_valid_obs = jnp.sum(mask.astype(jnp.float32), axis=2)

    # note: no sample-axis positional encoding here (reference :499)
    globalfeat = RayTransformer(dtype=dt, name="ray_attention")(
        globalfeat, globalfeat, globalfeat,
        mask=(num_valid_obs > 1).astype(jnp.float32))
    sigma = MLP((128, 1), dtype=dt,
                name="out_geometry_fc")(globalfeat).astype(jnp.float32)
    sigma = jnp.where(num_valid_obs < 1, -1e9, sigma)

    h = jnp.concatenate(
        [jnp.broadcast_to(globalfeat[:, :, None, :],
                          (r, s, num_views, globalfeat.shape[-1])),
         x, vis, ray_diff], axis=-1)
    # blending logits: softmax over views in f32 for stable -1e9 masking
    logits = MLP((128, 64, 1), dtype=dt,
                 name="rgb_fc")(h).astype(jnp.float32)
    logits = jnp.where(mask == 0, -1e9, logits)
    blend = jax.nn.softmax(logits, axis=2)
    rgb = jnp.sum(rgb_in.astype(jnp.float32) * blend, axis=2)
    return jnp.concatenate([rgb, sigma], axis=-1)
