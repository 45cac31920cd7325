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
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.render.render_rays import render_rays_mono
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
  return optax.multi_transform(
      transforms, param_labels=lambda params: {k: k for k in params})


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
  return optax.multi_transform(
      transforms, param_labels=lambda params: {k: k for k in params})


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


def make_train_step(model: MonoModel, tx: optax.GradientTransformation,
                    cfg: RenderSettings, *, bootstrap: bool = False,
                    donate: bool = True) -> Callable:
  """Build the jitted train step.

  step(state, rb, weights, rng) -> (state, metrics)
  """

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

  def step(state: TrainState, rb, weights, rng):
    grads, metrics = jax.grad(loss_fn, has_aux=True)(
        state.params, rb, weights, rng)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics

  donate_argnums = (0,) if donate else ()
  return jax.jit(step, donate_argnums=donate_argnums)
