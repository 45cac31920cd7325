"""Train-step and multi-device sharding tests (virtual 8-device CPU mesh)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynibar_tpu.config import DynibarConfig, RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_mono_batch
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.parallel.mesh import make_mesh, replicate, shard_ray_batch
from dynibar_tpu.train.losses import schedule_weights
from dynibar_tpu.train.trainer import (create_train_state, make_train_step,
                                       make_mono_loss_fn, make_mono_optimizer,
                                       steplr_schedule, _lr_cap_exponent)

CFG = RenderSettings(n_samples=16, num_views_dy=9, num_views_anchor=10,
                     num_views_static=6, num_vv=3, num_basis=4)


@pytest.fixture(scope="module")
def setup():
  config = DynibarConfig(N_rand=16, N_samples=16, num_basis=4,
                         init_decay_epoch=4)
  model = MonoModel(cfg=CFG, num_frames=32)
  state, tx = create_train_state(model, config, jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_mono_batch(
      CFG, n_rays=16, h=32, w=48, num_frames=32).items()}
  return config, model, state, tx, rb


def test_train_step_decreases_nothing_nan(setup):
  config, model, state, tx, rb = setup
  step_fn = make_train_step(model, tx, CFG, donate=False)
  weights = schedule_weights(config, epoch=0)
  state2, metrics = step_fn(state, rb, weights, jax.random.PRNGKey(1))
  for k, v in metrics.items():
    assert np.isfinite(float(v)), f"{k} is not finite"
  assert float(metrics["loss"]) > 0
  assert int(state2.step) == 1
  # params actually changed
  diff = jax.tree_util.tree_reduce(
      lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
      jax.tree_util.tree_map(
          lambda a, b: a - b, state2.params["motion_mlp"],
          state.params["motion_mlp"]), 0.0)
  assert diff > 0


def test_grad_clip_rescales_to_threshold(setup):
  """clip_grad_norm=c makes updates(g) == updates(g * c/||g||) for ||g||>c.

  This is the exact defining property of a prepended global-norm clip and
  is robust to Adam's per-coordinate renormalization (which hides the
  effect of a global rescale from step-size-based assertions).
  """
  config, model, state, _tx, _rb = setup
  clip = 1e-3
  tx_c = make_mono_optimizer(dataclasses.replace(config,
                                                 clip_grad_norm=clip))
  opt_state = tx_c.init(state.params)

  # synthetic huge gradients shaped like the params
  leaves, treedef = jax.tree_util.tree_flatten(state.params)
  keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
  grads = jax.tree_util.tree_unflatten(
      treedef, [100.0 * jax.random.normal(k, l.shape, l.dtype)
                for k, l in zip(keys, leaves)])
  import optax
  gnorm = float(optax.global_norm(grads))
  assert gnorm > clip
  pre_scaled = jax.tree_util.tree_map(lambda g: g * (clip / gnorm), grads)

  up_huge, _ = tx_c.update(grads, opt_state, state.params)
  up_scaled, _ = tx_c.update(pre_scaled, opt_state, state.params)
  for a, b in zip(jax.tree_util.tree_leaves(up_huge),
                  jax.tree_util.tree_leaves(up_scaled)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-8)

  # and clip off (default) keeps the plain multi_transform behavior
  tx_plain = make_mono_optimizer(config)
  up_plain, _ = tx_plain.update(pre_scaled, tx_plain.init(state.params),
                                state.params)
  up_clip_small, _ = tx_c.update(pre_scaled, opt_state, state.params)
  for a, b in zip(jax.tree_util.tree_leaves(up_plain),
                  jax.tree_util.tree_leaves(up_clip_small)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-8)


def test_bootstrap_step_runs(setup):
  config, model, state, tx, rb = setup
  step_fn = make_train_step(model, tx, CFG, bootstrap=True, donate=False)
  state2, metrics = step_fn(state, rb, None, jax.random.PRNGKey(2))
  assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("fused_train", [True, False])
def test_bootstrap_step_bf16_fused(setup, fused_train):
  """Phase-1 bootstrap differentiates with the production bf16+fused
  config: _agg_fns must gate on gradient need, not is_train (the
  forward-only pallas kernels have no VJP)."""
  config, model_unused, state, tx, rb = setup
  cfg = dataclasses.replace(CFG, compute_dtype="bfloat16",
                            fused_aggregators=True,
                            fused_aggregators_train=fused_train)
  model = MonoModel(cfg=cfg, num_frames=32)
  step_fn = make_train_step(model, tx, cfg, bootstrap=True, donate=False)
  state2, metrics = step_fn(state, rb, None, jax.random.PRNGKey(4))
  assert np.isfinite(float(metrics["loss"]))
  diff = jax.tree_util.tree_reduce(
      lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
      jax.tree_util.tree_map(
          lambda a, b: a - b, state2.params["net_coarse_st"],
          state.params["net_coarse_st"]), 0.0)
  assert diff > 0


def test_loss_schedule_decays():
  config = DynibarConfig(init_decay_epoch=10, w_disp=0.05, w_flow=0.005,
                         decay_rate=10.0, anneal_cycle=True)
  w0 = schedule_weights(config, epoch=0)
  w1 = schedule_weights(config, epoch=25)  # divisor = 2
  assert float(w1.w_disp) == pytest.approx(float(w0.w_disp) / 100.0)
  assert float(w1.w_flow) == pytest.approx(float(w0.w_flow) / 100.0)
  assert float(w1.dynamic_rgb_decay) == pytest.approx(0.01)
  assert float(w0.use_dynamic_mask_rgb) == 1.0
  assert float(w1.use_dynamic_mask_rgb) == 0.0
  assert float(w1.w_cycle) > float(w0.w_cycle)  # anneal up


def test_steplr_cap_matches_reference_freeze():
  # group-0 lr = lrate_mlp*0.5; freeze once <= 5e-7 (train.py:469-471)
  base = 4e-4 * 0.5
  cap = _lr_cap_exponent(base, 0.5)
  assert base * 0.5 ** cap <= 5e-7 < base * 0.5 ** (cap - 1)
  sched = steplr_schedule(base, 0.5, 10, cap)
  assert float(sched(0)) == pytest.approx(base)
  assert float(sched(10)) == pytest.approx(base * 0.5)
  assert float(sched(10_000_000)) == pytest.approx(base * 0.5 ** cap)


def test_steplr_cap_pins_all_six_mono_groups():
  """All six mono param groups freeze at the SAME decay count — the one at
  which group 0 (net_coarse_st, lr = lrate_mlp*0.5) crosses 5e-7.

  The reference stops stepping its single StepLR scheduler at that moment
  (train.py:469-471), freezing every group simultaneously; the rebuild caps
  each group's decay exponent at the group-0-derived cap.  Equivalent only
  because all groups share gamma and step together — pinned here at the
  boundary for each group's base lr (reference model.py:341-351 layout)."""
  config = DynibarConfig()
  gamma = config.lrate_decay_factor
  steps = max(1, config.lrate_decay_steps)
  group_lrs = {
      "net_coarse_st": config.lrate_mlp * 0.5,
      "feature_net_st": config.lrate_feature * 0.5,
      "net_coarse_dy": config.lrate_mlp,
      "feature_net": config.lrate_feature,
      "motion_mlp": config.lrate_mlp,
      "traj_basis": config.lrate_mlp * 0.25,
  }
  cap = _lr_cap_exponent(group_lrs["net_coarse_st"], gamma)
  # reference freeze point: smallest e with group-0 lr <= 5e-7
  e = 0
  while group_lrs["net_coarse_st"] * gamma ** e > 5e-7:
    e += 1
  assert cap == e
  for name, base in group_lrs.items():
    sched = steplr_schedule(base, gamma, steps, cap)
    # one decay step before the freeze: still decaying
    assert float(sched((cap - 1) * steps)) == pytest.approx(
        base * gamma ** (cap - 1), rel=1e-6), name
    # at the freeze point and forever after: pinned at base * gamma^cap
    frozen = base * gamma ** cap
    assert float(sched(cap * steps)) == pytest.approx(frozen, rel=1e-6), name
    assert float(sched(100 * cap * steps)) == pytest.approx(
        frozen, rel=1e-6), name
  # only group 0 is guaranteed at/below the reference floor when frozen
  assert group_lrs["net_coarse_st"] * gamma ** cap <= 5e-7


def test_sharded_train_step_8_devices(setup):
  """Sharded == single-device for the TRAIN step, to numerical tolerance.

  The SAME batch runs through the single-device and 8-device-mesh train
  steps; loss and post-step parameters must match.  This kills the bug
  class the reference actually shipped (train.py:769-772: data sharded
  across ranks, gradients never averaged) — a wrong or missing grad
  all-reduce moves every updated parameter, which isfinite checks (the
  pre-round-4 assertion) could never see."""
  config, model, state, tx, rb_unused = setup
  assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
  mesh = make_mesh(jax.devices()[:8])
  rb_host = synthetic_mono_batch(CFG, n_rays=16, h=32, w=48, num_frames=32)
  step_fn = make_train_step(model, tx, CFG, donate=False)
  weights = schedule_weights(config, epoch=0)
  rng = jax.random.PRNGKey(3)

  # single-device reference step on the identical inputs
  rb_single = {k: jnp.asarray(v) for k, v in rb_host.items()}
  state1, metrics1 = step_fn(state, rb_single, weights, rng)

  with mesh:
    state_r = replicate(mesh, state)
    rb = shard_ray_batch(mesh, rb_host)
    # per-ray arrays really live sharded across the mesh
    assert len(rb["ray_o"].sharding.device_set) == 8
    state2, metrics = step_fn(state_r, rb, weights, rng)
    assert np.isfinite(float(metrics["loss"]))
    # updated params stay replicated (grad all-reduce happened)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)

  np.testing.assert_allclose(float(metrics["loss"]),
                             float(metrics1["loss"]), rtol=1e-5)
  np.testing.assert_allclose(float(metrics["grad_norm"]),
                             float(metrics1["grad_norm"]), rtol=1e-4)
  # GRADIENTS are where the all-reduce mean lives: differentiate the exact
  # loss the step uses, single-device vs mesh-sharded, and demand per-leaf
  # relative-norm agreement.  (Post-Adam params can't be compared tightly:
  # near-zero-gradient elements make step-1 Adam a sign function, so
  # reduction-order noise flips them by O(lr).)
  loss_fn = make_mono_loss_fn(model, CFG)
  grad_fn = jax.jit(jax.grad(lambda p, b: loss_fn(p, b, weights, rng)[0]))
  g1 = grad_fn(state.params, rb_single)
  with mesh:
    g2 = grad_fn(replicate(mesh, state.params), rb)
  for k in g1:
    n1 = np.sqrt(sum(float(np.sum(np.square(x)))
                     for x in jax.tree_util.tree_leaves(g1[k])))
    nd = np.sqrt(sum(float(np.sum(np.square(np.asarray(a) - np.asarray(b))))
                     for a, b in zip(jax.tree_util.tree_leaves(g1[k]),
                                     jax.tree_util.tree_leaves(g2[k]))))
    assert nd <= 1e-4 * max(n1, 1e-8), (
        f"sharded grad for group {k} deviates: |d|={nd:.3g} vs |g|={n1:.3g}")
  # params get a coarse absolute backstop only: step-1 Adam is
  # scale-invariant in the gradient (m/sqrt(v) = g/|g|), so near-zero-grad
  # elements wobble by O(lr) under reduction reordering — and that same
  # invariance means params at step 1 could NOT expose a missing grad mean
  # even if compared exactly.  The per-group gradient check above is the
  # assertion that kills the reference's train.py:769-772 bug class.
  for a1, a2 in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-3)


def test_graft_entry_contract():
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "__graft_entry__", "/root/repo/__graft_entry__.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  fn, (params, rb) = mod.entry()
  out = jax.jit(fn)(params, rb)
  assert out.shape[-1] == 3
  assert np.isfinite(np.asarray(out)).all()
