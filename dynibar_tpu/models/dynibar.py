"""Model containers: module definitions + parameter pytrees.

Rebuilds of the reference containers (ibrnet/model.py:33-289 ``DynibarFF``,
:291-501 ``DynibarMono``) as *stateless* bundles of Flax module definitions.
Parameters live in a plain dict pytree (one key per sub-network, plus the
learnable trajectory basis), which keeps optimizer param-group labeling
(optax.multi_transform) and checkpointing (orbax) trivial.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dynibar_tpu.config import DynibarConfig, RenderSettings
from dynibar_tpu.core.motion import init_dct_basis
from dynibar_tpu.models.aggregators import DynamicAggregator, StaticAggregator
from dynibar_tpu.models.feature_net import FeatureNet
from dynibar_tpu.models.motion_mlp import MotionMLP

Params = Dict[str, Any]


def _pallas_interpret() -> bool:
  # Mosaic compiles on real TPUs only; interpret keeps the CPU test mesh
  # working (same convention as core/projection.py)
  return jax.default_backend() != "tpu"


def _compute_dtype(cfg: RenderSettings):
  return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def _init_aggregators(cfg: RenderSettings, n_samples: int, shift: float):
  dt = _compute_dtype(cfg)
  net_st = StaticAggregator(
      in_feat_ch=cfg.coarse_feat_dim, n_samples=n_samples,
      anti_alias_pooling=cfg.anti_alias_pooling, mask_rgb=cfg.mask_rgb,
      compute_dtype=dt)
  net_dy = DynamicAggregator(
      in_feat_ch=cfg.coarse_feat_dim, n_samples=n_samples, shift=shift,
      compute_dtype=dt)
  return net_st, net_dy


def _agg_dummy_inputs(n_samples: int, num_views: int, feat_ch: int):
  r, s, v = 2, n_samples, num_views
  return dict(
      pts=jnp.zeros((r, s, 3)),
      ref_pl=jnp.zeros((r, 6)),
      src_pl=jnp.zeros((r, s, v, 6)),
      rgb_feat=jnp.zeros((r, s, v, feat_ch + 3)),
      ray_dir=jnp.zeros((r, 3)),
      ray_diff=jnp.zeros((r, s, v, 4)),
      time_diff=jnp.zeros((r, s, v, 1)),
      mask=jnp.ones((r, s, v, 1)),
      time=jnp.zeros((r, s, 1)),
  )


@dataclasses.dataclass(frozen=True)
class MonoModel:
  """Monocular-video model: coarse static+dynamic aggregators, two feature
  nets, one motion MLP, one learnable DCT basis (reference model.py:291-397).
  """

  cfg: RenderSettings
  num_frames: int
  dy_shift: float = 5.0  # reference model.py:307
  # rematerialize aggregator activations in the backward pass: trades one
  # extra forward for O(1) stored residuals per network -> much larger
  # N_rand fits in HBM during training
  remat: bool = False

  def _maybe_remat(self, fn):
    return jax.checkpoint(fn) if self.remat else fn

  @property
  def net_coarse_st(self) -> StaticAggregator:
    return _init_aggregators(self.cfg, self.cfg.n_samples, self.dy_shift)[0]

  @property
  def net_coarse_dy(self) -> DynamicAggregator:
    return _init_aggregators(self.cfg, self.cfg.n_samples, self.dy_shift)[1]

  @property
  def feature_net(self) -> FeatureNet:
    return FeatureNet(self.cfg.coarse_feat_dim, self.cfg.fine_feat_dim,
                      compute_dtype=_compute_dtype(self.cfg))

  @property
  def feature_net_st(self) -> FeatureNet:
    return FeatureNet(self.cfg.coarse_feat_dim, self.cfg.fine_feat_dim,
                      compute_dtype=_compute_dtype(self.cfg))

  @property
  def motion_mlp(self) -> MotionMLP:
    return MotionMLP(num_basis=self.cfg.num_basis)

  def init_params(self, rng: jax.Array) -> Params:
    cfg = self.cfg
    keys = jax.random.split(rng, 5)
    d = _agg_dummy_inputs(cfg.n_samples, cfg.num_views_dy, cfg.coarse_feat_dim)
    ds = _agg_dummy_inputs(cfg.n_samples, cfg.num_views_static,
                           cfg.coarse_feat_dim)
    img = jnp.zeros((1, 64, 64, 3))
    return {
        "net_coarse_st": self.net_coarse_st.init(
            keys[0], ds["pts"], ds["ref_pl"], ds["src_pl"], ds["rgb_feat"],
            ds["ray_dir"], ds["ray_diff"], ds["mask"])["params"],
        "net_coarse_dy": self.net_coarse_dy.init(
            keys[1], d["pts"], d["rgb_feat"], d["ray_dir"], d["ray_diff"],
            d["time_diff"], d["mask"], d["time"])["params"],
        "feature_net": self.feature_net.init(keys[2], img)["params"],
        "feature_net_st": self.feature_net_st.init(keys[3], img)["params"],
        "motion_mlp": self.motion_mlp.init(
            keys[4], jnp.zeros((2, 4)))["params"],
        "traj_basis": jnp.asarray(
            init_dct_basis(cfg.num_basis, self.num_frames)),
    }

  # ---- apply helpers (closed over module defs, param subtree passed in) ----
  def apply_dy(self, params, *args):
    fn = lambda p, *a: self.net_coarse_dy.apply({"params": p}, *a)
    return self._maybe_remat(fn)(params["net_coarse_dy"], *args)

  def apply_st(self, params, *args):
    fn = lambda p, *a: self.net_coarse_st.apply({"params": p}, *a)
    return self._maybe_remat(fn)(params["net_coarse_st"], *args)

  def apply_dy_fused(self, params, *args, **kw):
    from dynibar_tpu.ops.pallas_agg import fused_dynamic_aggregator
    return fused_dynamic_aggregator(
        params["net_coarse_dy"], *args, shift=self.dy_shift,
        n_samples=self.cfg.n_samples, interpret=_pallas_interpret(), **kw)

  def apply_st_fused(self, params, *args, **kw):
    from dynibar_tpu.ops.pallas_agg import fused_static_aggregator
    return fused_static_aggregator(
        params["net_coarse_st"], *args,
        anti_alias_pooling=self.cfg.anti_alias_pooling,
        mask_rgb=self.cfg.mask_rgb, interpret=_pallas_interpret(), **kw)

  # differentiable fused paths: Pallas forward, flax-derived backward
  # (ops/pallas_agg.attach_flax_grad) — used by training when
  # cfg.fused_aggregators_train is set
  def apply_dy_fused_diff(self, params, *args):
    import functools
    from dynibar_tpu.ops.pallas_agg import (attach_flax_grad,
                                            fused_dynamic_aggregator)
    if self.cfg.fused_bwd_impl in ("pallas", "pallas_split"):
      return fused_dynamic_aggregator(
          params["net_coarse_dy"], *args, shift=self.dy_shift,
          n_samples=self.cfg.n_samples, interpret=_pallas_interpret(),
          pallas_bwd=("split" if self.cfg.fused_bwd_impl == "pallas_split"
                      else True))
    fused = functools.partial(
        fused_dynamic_aggregator, shift=self.dy_shift,
        n_samples=self.cfg.n_samples, interpret=_pallas_interpret())
    flax = lambda p, *a: self.net_coarse_dy.apply({"params": p}, *a)
    return attach_flax_grad(fused, flax)(params["net_coarse_dy"], *args)

  def apply_st_fused_diff(self, params, *args):
    import functools
    from dynibar_tpu.ops.pallas_agg import (attach_flax_grad,
                                            fused_static_aggregator)
    if self.cfg.fused_st_bwd_impl in ("pallas_split", "pallas_split3"):
      return fused_static_aggregator(
          params["net_coarse_st"], *args,
          anti_alias_pooling=self.cfg.anti_alias_pooling,
          mask_rgb=self.cfg.mask_rgb, interpret=_pallas_interpret(),
          pallas_bwd=("split3" if self.cfg.fused_st_bwd_impl
                      == "pallas_split3" else "split"))
    fused = functools.partial(
        fused_static_aggregator,
        anti_alias_pooling=self.cfg.anti_alias_pooling,
        mask_rgb=self.cfg.mask_rgb, interpret=_pallas_interpret())
    flax = lambda p, *a: self.net_coarse_st.apply({"params": p}, *a)
    return attach_flax_grad(fused, flax)(params["net_coarse_st"], *args)

  def apply_motion(self, params, xyzt):
    fn = lambda p, x: self.motion_mlp.apply({"params": p}, x)
    return self._maybe_remat(fn)(params["motion_mlp"], xyzt)

  def apply_feature(self, params, imgs):
    return self.feature_net.apply({"params": params["feature_net"]}, imgs)

  def apply_feature_st(self, params, imgs):
    return self.feature_net_st.apply(
        {"params": params["feature_net_st"]}, imgs)


@dataclasses.dataclass(frozen=True)
class FFModel:
  """Forward-facing (Nvidia benchmark) model: frozen coarse + trainable fine
  static/dynamic aggregators, two feature nets, two motion MLPs, two bases
  (reference model.py:33-159)."""

  cfg: RenderSettings
  num_frames: int
  # rematerialize aggregator activations in the backward pass (see
  # MonoModel.remat): used by the fine-stage/coarse-stage FF trainers
  remat: bool = False

  def _maybe_remat(self, fn):
    return jax.checkpoint(fn) if self.remat else fn

  def _nets(self, fine: bool):
    n_total = self.cfg.n_samples + (self.cfg.n_importance if fine else 0)
    feat = self.cfg.fine_feat_dim if fine else self.cfg.coarse_feat_dim
    dt = _compute_dtype(self.cfg)
    net_st = StaticAggregator(
        in_feat_ch=feat, n_samples=n_total,
        anti_alias_pooling=self.cfg.anti_alias_pooling,
        mask_rgb=self.cfg.mask_rgb, compute_dtype=dt)
    net_dy = DynamicAggregator(in_feat_ch=feat, n_samples=n_total, shift=0.0,
                               compute_dtype=dt)
    return net_st, net_dy

  @property
  def feature_net(self) -> FeatureNet:
    return FeatureNet(self.cfg.coarse_feat_dim, self.cfg.fine_feat_dim,
                      compute_dtype=_compute_dtype(self.cfg))

  @property
  def motion_mlp(self) -> MotionMLP:
    return MotionMLP(num_basis=self.cfg.num_basis)

  def init_params(self, rng: jax.Array) -> Params:
    cfg = self.cfg
    keys = jax.random.split(rng, 8)
    img = jnp.zeros((1, 64, 64, 3))
    params: Params = {}
    for prefix, fine, kidx in (("coarse", False, 0), ("fine", True, 3)):
      net_st, net_dy = self._nets(fine)
      n_total = cfg.n_samples + (cfg.n_importance if fine else 0)
      feat = cfg.fine_feat_dim if fine else cfg.coarse_feat_dim
      d = _agg_dummy_inputs(n_total, cfg.num_views_dy, feat)
      ds = _agg_dummy_inputs(n_total, cfg.num_views_static, feat)
      params[f"net_{prefix}_st"] = net_st.init(
          keys[kidx], ds["pts"], ds["ref_pl"], ds["src_pl"], ds["rgb_feat"],
          ds["ray_dir"], ds["ray_diff"], ds["mask"])["params"]
      params[f"net_{prefix}_dy"] = net_dy.init(
          keys[kidx + 1], d["pts"], d["rgb_feat"], d["ray_dir"],
          d["ray_diff"], d["time_diff"], d["mask"], d["time"])["params"]
      params[f"motion_mlp{'_fine' if fine else ''}"] = self.motion_mlp.init(
          keys[kidx + 2], jnp.zeros((2, 4)))["params"]
    params["feature_net"] = self.feature_net.init(keys[6], img)["params"]
    params["feature_net_fine"] = self.feature_net.init(keys[7], img)["params"]
    basis = jnp.asarray(init_dct_basis(cfg.num_basis, self.num_frames))
    params["traj_basis"] = basis
    params["traj_basis_fine"] = basis
    return params

  def apply_dy(self, params, stage, *args):
    _, net_dy = self._nets(stage == "fine")
    fn = lambda p, *a: net_dy.apply({"params": p}, *a)  # noqa: E731
    return self._maybe_remat(fn)(params[f"net_{stage}_dy"], *args)

  def apply_st(self, params, stage, *args):
    net_st, _ = self._nets(stage == "fine")
    fn = lambda p, *a: net_st.apply({"params": p}, *a)  # noqa: E731
    return self._maybe_remat(fn)(params[f"net_{stage}_st"], *args)

  def apply_dy_fused(self, params, stage, *args, **kw):
    from dynibar_tpu.ops.pallas_agg import fused_dynamic_aggregator
    n_total = self.cfg.n_samples + (self.cfg.n_importance
                                    if stage == "fine" else 0)
    return fused_dynamic_aggregator(
        params[f"net_{stage}_dy"], *args, shift=0.0, n_samples=n_total,
        interpret=_pallas_interpret(), **kw)

  def apply_st_fused(self, params, stage, *args, **kw):
    from dynibar_tpu.ops.pallas_agg import fused_static_aggregator
    return fused_static_aggregator(
        params[f"net_{stage}_st"], *args,
        anti_alias_pooling=self.cfg.anti_alias_pooling,
        mask_rgb=self.cfg.mask_rgb, interpret=_pallas_interpret(), **kw)

  def apply_dy_fused_diff(self, params, stage, *args):
    import functools
    from dynibar_tpu.ops.pallas_agg import (attach_flax_grad,
                                            fused_dynamic_aggregator)
    n_total = self.cfg.n_samples + (self.cfg.n_importance
                                    if stage == "fine" else 0)
    if self.cfg.fused_bwd_impl in ("pallas", "pallas_split"):
      return fused_dynamic_aggregator(
          params[f"net_{stage}_dy"], *args, shift=0.0, n_samples=n_total,
          interpret=_pallas_interpret(),
          pallas_bwd=("split" if self.cfg.fused_bwd_impl == "pallas_split"
                      else True))
    fused = functools.partial(fused_dynamic_aggregator, shift=0.0,
                              n_samples=n_total,
                              interpret=_pallas_interpret())
    _, net_dy = self._nets(stage == "fine")
    flax = lambda p, *a: net_dy.apply({"params": p}, *a)
    return attach_flax_grad(fused, flax)(params[f"net_{stage}_dy"], *args)

  def apply_st_fused_diff(self, params, stage, *args):
    import functools
    from dynibar_tpu.ops.pallas_agg import (attach_flax_grad,
                                            fused_static_aggregator)
    if self.cfg.fused_st_bwd_impl in ("pallas_split", "pallas_split3"):
      return fused_static_aggregator(
          params[f"net_{stage}_st"], *args,
          anti_alias_pooling=self.cfg.anti_alias_pooling,
          mask_rgb=self.cfg.mask_rgb, interpret=_pallas_interpret(),
          pallas_bwd=("split3" if self.cfg.fused_st_bwd_impl
                      == "pallas_split3" else "split"))
    fused = functools.partial(
        fused_static_aggregator,
        anti_alias_pooling=self.cfg.anti_alias_pooling,
        mask_rgb=self.cfg.mask_rgb, interpret=_pallas_interpret())
    net_st, _ = self._nets(stage == "fine")
    flax = lambda p, *a: net_st.apply({"params": p}, *a)
    return attach_flax_grad(fused, flax)(params[f"net_{stage}_st"], *args)

  def apply_motion(self, params, stage, xyzt):
    key = "motion_mlp_fine" if stage == "fine" else "motion_mlp"
    return self.motion_mlp.apply({"params": params[key]}, xyzt)

  def apply_feature(self, params, which, imgs):
    return self.feature_net.apply({"params": params[which]}, imgs)
