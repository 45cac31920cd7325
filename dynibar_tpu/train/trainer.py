"""Optimizer wiring + jitted train steps for the monocular model.

Rebuilds:
  * Adam param groups with per-module learning rates
    (reference model.py:341-351) -> optax.multi_transform over the top-level
    parameter keys;
  * StepLR ×gamma every `lrate_decay_steps`, frozen once the first group's lr
    falls to 5e-7 (reference train.py:469-471) -> a capped staircase
    schedule;
  * the phase-1 static bootstrap step (train.py:116-199) and the phase-2
    full-loss step (train.py:227-471), each a single jit-compiled function
    that re-encodes the source images through both feature nets and renders
    + differentiates the whole pipeline in one XLA program.

Multi-chip: rays are the sharded axis.  `shard_ray_batch` places the
per-ray arrays on a ('data',) mesh axis and replicates view/image data;
under jit, XLA inserts the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dynibar_tpu.config import DynibarConfig, RenderSettings
from dynibar_tpu.models.dynibar import FFModel, MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono, render_rays_mv
from dynibar_tpu.train import losses as losses_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
  params: Any
  opt_state: Any
  step: jnp.ndarray


def steplr_schedule(base_lr: float, gamma: float, decay_steps: int,
                    cap_exponent: int) -> optax.Schedule:
  """StepLR with a hard cap on the number of decays."""
  def schedule(count):
    e = jnp.minimum(count // decay_steps, cap_exponent)
    return base_lr * (gamma ** e)
  return schedule


def _lr_cap_exponent(first_group_lr: float, gamma: float,
                     floor: float = 5e-7) -> int:
  """Number of decays after which the reference scheduler freezes
  (first param group's lr <= 5e-7, train.py:469-471)."""
  if first_group_lr <= floor:
    return 0
  return int(math.ceil(math.log(floor / first_group_lr) / math.log(gamma)))


def make_mono_optimizer(config: DynibarConfig) -> optax.GradientTransformation:
  """Adam with the reference's per-module lr multipliers."""
  gamma = config.lrate_decay_factor
  steps = max(1, config.lrate_decay_steps)
  # group order follows reference model.py:341-351; group 0 = net_coarse_st
  cap = _lr_cap_exponent(config.lrate_mlp * 0.5, gamma)

  def adam(lr):
    return optax.adam(steplr_schedule(lr, gamma, steps, cap))

  transforms = {
      "net_coarse_st": adam(config.lrate_mlp * 0.5),
      "feature_net_st": adam(config.lrate_feature * 0.5),
      "net_coarse_dy": adam(config.lrate_mlp),
      "feature_net": adam(config.lrate_feature),
      "motion_mlp": adam(config.lrate_mlp),
      "traj_basis": adam(config.lrate_mlp * 0.25),
  }
  tx = optax.multi_transform(
      transforms, param_labels=lambda params: {k: k for k in params})
  return _maybe_clip(tx, config)


def _maybe_clip(tx: optax.GradientTransformation,
                config: DynibarConfig) -> optax.GradientTransformation:
  """Prepend a global-norm clip when config.clip_grad_norm > 0."""
  if getattr(config, "clip_grad_norm", 0.0) and config.clip_grad_norm > 0:
    return optax.chain(optax.clip_by_global_norm(config.clip_grad_norm), tx)
  return tx


def make_ff_optimizer(config: DynibarConfig) -> optax.GradientTransformation:
  """Adam param groups for fine-stage (forward-facing) training
  (reference model.py:106-118); coarse nets + basis stay frozen."""
  gamma = config.lrate_decay_factor
  steps = max(1, config.lrate_decay_steps)
  cap = _lr_cap_exponent(config.lrate_mlp * config.lr_multipler, gamma)

  def adam(lr):
    return optax.adam(steplr_schedule(lr, gamma, steps, cap))

  frozen = optax.set_to_zero()
  transforms = {
      "net_fine_st": adam(config.lrate_mlp * config.lr_multipler),
      "net_fine_dy": adam(config.lrate_mlp),
      "feature_net_fine": adam(config.lrate_feature),
      "motion_mlp_fine": adam(config.lrate_mlp),
      "traj_basis_fine": adam(config.lrate_mlp * 0.25),
      # frozen coarse stage (loaded from coarse_dir)
      "net_coarse_st": frozen,
      "net_coarse_dy": frozen,
      "feature_net": frozen,
      "motion_mlp": frozen,
      "traj_basis": frozen,
  }
  tx = optax.multi_transform(
      transforms, param_labels=lambda params: {k: k for k in params})
  return _maybe_clip(tx, config)


def create_train_state(model: MonoModel, config: DynibarConfig,
                       rng: jax.Array) -> Tuple[TrainState,
                                                optax.GradientTransformation]:
  params = model.init_params(rng)
  tx = make_mono_optimizer(config)
  return TrainState(params=params, opt_state=tx.init(params),
                    step=jnp.zeros((), jnp.int32)), tx


def compute_featmaps(model: MonoModel, params, rb):
  """Per-step re-encoding of all source images (reference train.py:264-281).

  InstanceNorm has no cross-image state, so encoding the dynamic and anchor
  stacks separately is numerically identical to the reference's concat.
  """
  dy, _ = model.apply_feature(params, rb["src_rgbs"])
  anchor, _ = model.apply_feature(params, rb["anchor_src_rgbs"])
  st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
  return dy, anchor, st


def make_mono_loss_fn(model: MonoModel, cfg: RenderSettings, *,
                      bootstrap: bool = False) -> Callable:
  """The train step's loss closure: loss_fn(params, rb, weights, rng) ->
  (loss, metrics).  Exposed so equivalence tests can differentiate the
  exact program the train step uses (sharded-vs-single gradient parity)."""

  def loss_fn(params, rb, weights, rng):
    featmaps = compute_featmaps(model, params, rb)
    ret = render_rays_mono(model, params, rb, featmaps, cfg,
                           is_train=not bootstrap, det=False, rng=rng,
                           needs_grad=True)
    if bootstrap:
      loss = losses_lib.compute_bootstrap_loss(ret, rb)
      metrics = {"loss": loss, "static_loss": loss}
    else:
      metrics = losses_lib.compute_mono_losses(ret, rb, weights)
      loss = metrics["loss"]
    mse = jnp.mean((ret["outputs_coarse_ref"]["rgb"] - rb["rgb"]) ** 2)
    metrics["psnr"] = -10.0 * jnp.log(mse + 1e-8) / jnp.log(10.0)
    return loss, metrics

  return loss_fn


def make_train_step(model: MonoModel, tx: optax.GradientTransformation,
                    cfg: RenderSettings, *, bootstrap: bool = False,
                    donate: bool = True) -> Callable:
  """Build the jitted train step.

  step(state, rb, weights, rng) -> (state, metrics)
  """
  loss_fn = make_mono_loss_fn(model, cfg, bootstrap=bootstrap)

  def step(state: TrainState, rb, weights, rng):
    grads, metrics = jax.grad(loss_fn, has_aux=True)(
        state.params, rb, weights, rng)
    metrics["grad_norm"] = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics

  donate_argnums = (0,) if donate else ()
  return jax.jit(step, donate_argnums=donate_argnums)


FF_COARSE_KEYS = ("net_coarse_st", "net_coarse_dy", "feature_net",
                  "motion_mlp", "traj_basis")


def make_ff_coarse_optimizer(
    config: DynibarConfig) -> optax.GradientTransformation:
  """Adam param groups for COARSE-stage FF training (the run that produces
  the frozen checkpoint model.py:102 loads).  Mirrors the mono layout
  (reference model.py:341-351) on the coarse groups; fine groups frozen."""
  gamma = config.lrate_decay_factor
  steps = max(1, config.lrate_decay_steps)
  cap = _lr_cap_exponent(config.lrate_mlp * 0.5, gamma)

  def adam(lr):
    return optax.adam(steplr_schedule(lr, gamma, steps, cap))

  frozen = optax.set_to_zero()
  transforms = {
      "net_coarse_st": adam(config.lrate_mlp * 0.5),
      "net_coarse_dy": adam(config.lrate_mlp),
      "feature_net": adam(config.lrate_feature),
      "motion_mlp": adam(config.lrate_mlp),
      "traj_basis": adam(config.lrate_mlp * 0.25),
      "net_fine_st": frozen,
      "net_fine_dy": frozen,
      "feature_net_fine": frozen,
      "motion_mlp_fine": frozen,
      "traj_basis_fine": frozen,
  }
  tx = optax.multi_transform(
      transforms, param_labels=lambda params: {k: k for k in params})
  return _maybe_clip(tx, config)


def compute_ff_coarse_featmaps(model: FFModel, params, rb):
  """Featmap tuple (dy, anchor, static) for coarse-stage FF training.

  Channel routing follows the eval wiring for the coarse stage
  (eval_nvidia.py:335-358): dynamic <- feature_net coarse channels,
  static <- feature_net FINE channels; anchors route like dynamic.
  """
  c_src, _ = model.apply_feature(params, "feature_net", rb["src_rgbs"])
  c_anchor, _ = model.apply_feature(params, "feature_net",
                                    rb["anchor_src_rgbs"])
  _, c_st = model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])
  return (c_src, c_anchor, c_st)


def make_ff_coarse_loss_fn(model: FFModel, cfg: RenderSettings) -> Callable:
  """Coarse-stage FF loss closure — the mono 8-term assembly applied to
  the coarse outputs (render_rays_ff_coarse's ret key layout)."""
  from dynibar_tpu.render.render_rays import render_rays_ff_coarse

  def loss_fn(params, rb, weights, rng):
    fm = compute_ff_coarse_featmaps(model, params, rb)
    ret = render_rays_ff_coarse(model, params, rb, fm, cfg,
                                det=False, is_train=True, rng=rng,
                                needs_grad=True)
    metrics = losses_lib.compute_mono_losses(ret, rb, weights)
    loss = metrics["loss"]
    mse = jnp.mean((ret["outputs_coarse_ref"]["rgb"] - rb["rgb"]) ** 2)
    metrics["psnr"] = -10.0 * jnp.log(mse + 1e-8) / jnp.log(10.0)
    return loss, metrics

  return loss_fn


def make_ff_coarse_train_step(model: FFModel,
                              tx: optax.GradientTransformation,
                              cfg: RenderSettings, *,
                              donate: bool = True) -> Callable:
  """Jitted coarse-stage FF train step: step(state, rb, weights, rng)."""
  loss_fn = make_ff_coarse_loss_fn(model, cfg)

  def step(state: TrainState, rb, weights, rng):
    grads, metrics = jax.grad(loss_fn, has_aux=True)(
        state.params, rb, weights, rng)
    metrics["grad_norm"] = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics

  donate_argnums = (0,) if donate else ()
  return jax.jit(step, donate_argnums=donate_argnums)


def create_ff_train_state(
    model: FFModel, config: DynibarConfig, rng: jax.Array,
    coarse_params: Optional[Dict[str, Any]] = None
) -> Tuple[TrainState, optax.GradientTransformation]:
  """Init FF params; graft the frozen coarse stage from a finished coarse
  run (reference model.py:102 load_coarse_from_ckpt)."""
  params = model.init_params(rng)
  if coarse_params is not None:
    for key in FF_COARSE_KEYS:
      params[key] = jax.tree_util.tree_map(jnp.asarray, coarse_params[key])
  tx = make_ff_optimizer(config)
  return TrainState(params=params, opt_state=tx.init(params),
                    step=jnp.zeros((), jnp.int32)), tx


def compute_ff_featmaps(model: FFModel, params, rb):
  """Featmap tuples for FF training.

  Channel routing follows the reference eval wiring (eval_nvidia.py:335-358):
  coarse dynamic <- feature_net coarse channels, coarse static <-
  feature_net *fine* channels, fine dynamic/anchor <- feature_net_fine
  *coarse* channels, fine static <- feature_net_fine fine channels.  The
  coarse maps are stop_gradient'd: the whole coarse stage is frozen, so
  cutting here keeps its encode out of the backward program entirely.
  """
  c_src, _ = model.apply_feature(params, "feature_net", rb["src_rgbs"])
  _, c_st = model.apply_feature(params, "feature_net",
                                rb["static_src_rgbs"])
  coarse = jax.tree_util.tree_map(jax.lax.stop_gradient, (c_src, c_st))
  f_src, _ = model.apply_feature(params, "feature_net_fine", rb["src_rgbs"])
  f_anchor, _ = model.apply_feature(params, "feature_net_fine",
                                    rb["anchor_src_rgbs"])
  _, f_st = model.apply_feature(params, "feature_net_fine",
                                rb["static_src_rgbs"])
  return (coarse[0], None, coarse[1]), (f_src, f_anchor, f_st)


def make_ff_loss_fn(model: FFModel, cfg: RenderSettings) -> Callable:
  """FF fine-stage loss closure (see make_mono_loss_fn)."""

  def loss_fn(params, rb, weights, rng):
    coarse_fm, fine_fm = compute_ff_featmaps(model, params, rb)
    ret = render_rays_mv(model, params, rb, coarse_fm, fine_fm, cfg,
                         det=False, is_train=True, rng=rng, needs_grad=True)
    metrics = losses_lib.compute_ff_losses(ret, rb, weights)
    loss = metrics["loss"]
    mse = jnp.mean((ret["outputs_fine_ref"]["rgb"] - rb["rgb"]) ** 2)
    metrics["psnr"] = -10.0 * jnp.log(mse + 1e-8) / jnp.log(10.0)
    return loss, metrics

  return loss_fn


def make_ff_train_step(model: FFModel, tx: optax.GradientTransformation,
                       cfg: RenderSettings, *,
                       donate: bool = True) -> Callable:
  """Jitted fine-stage train step for the forward-facing model.

  step(state, rb, weights, rng) -> (state, metrics).  Gradients reach only
  the fine-stage groups; make_ff_optimizer zeroes the rest (and the render
  core stop_gradients the coarse program), so the frozen coarse params are
  bit-identical across steps.
  """
  loss_fn = make_ff_loss_fn(model, cfg)

  def step(state: TrainState, rb, weights, rng):
    grads, metrics = jax.grad(loss_fn, has_aux=True)(
        state.params, rb, weights, rng)
    metrics["grad_norm"] = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics

  donate_argnums = (0,) if donate else ()
  return jax.jit(step, donate_argnums=donate_argnums)
