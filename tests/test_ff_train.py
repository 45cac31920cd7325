"""Forward-facing (fine-stage) training: anchor branch, frozen coarse.

The shipped reference has no FF train loop (DynibarFF appears only in
eval_nvidia.py and its fine_render_rays always returns None anchors,
render_ray.py:583-584); these tests pin the rebuilt FF training path: the
fine-stage cross-time branch, the 8-term fine loss, exactly-zero coarse
gradients and bit-frozen coarse params under make_ff_optimizer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynibar_tpu.config import DynibarConfig, RenderSettings
from dynibar_tpu.data.ray_batch import synthetic_ff_batch
from dynibar_tpu.models.dynibar import FFModel
from dynibar_tpu.render.render_rays import render_rays_mv
from dynibar_tpu.train import losses as losses_lib
from dynibar_tpu.train.trainer import (FF_COARSE_KEYS, compute_ff_featmaps,
                                       create_ff_train_state,
                                       make_ff_train_step)

CFG = RenderSettings(
    n_samples=6, n_importance=6, num_views_dy=7, num_views_anchor=6,
    num_views_static=4, num_vv=0, num_basis=4, inv_uniform=True,
    anti_alias_pooling=True, mask_rgb=False, mono_time_diff=False)
NUM_FRAMES = 32


def _setup():
  config = DynibarConfig(N_samples=CFG.n_samples,
                         N_importance=CFG.n_importance,
                         num_basis=CFG.num_basis, lrate_mlp=1e-3,
                         lrate_feature=1e-3, lrate_decay_steps=100)
  model = FFModel(cfg=CFG, num_frames=NUM_FRAMES)
  state, tx = create_ff_train_state(model, config, jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      CFG, n_rays=4, h=32, w=48, num_frames=NUM_FRAMES, ref_idx=10).items()}
  weights = losses_lib.schedule_weights(config, 0)
  return config, model, state, tx, rb, weights


@pytest.mark.compileheavy
def test_render_rays_mv_train_anchor_branch():
  _, model, state, _, rb, _ = _setup()
  coarse_fm, fine_fm = compute_ff_featmaps(model, state.params, rb)
  ret = render_rays_mv(model, state.params, rb, coarse_fm, fine_fm, CFG,
                       det=False, is_train=True,
                       rng=jax.random.PRNGKey(3))
  anchor = ret["outputs_fine_anchor"]
  assert anchor is not None
  n_total = CFG.n_samples + CFG.n_importance
  assert anchor["rgb"].shape == (4, 3)
  assert anchor["occ_weights"].shape == (4, n_total)
  assert anchor["pts_traj_ref"].shape == (6, 4, n_total, 3)
  assert np.isfinite(np.asarray(anchor["occ_weight_map"])).all()
  # anchor offsets [-3,-2,0,1,2,3] with delta=+1: only o=+3 pairs outside
  # the window
  assert np.asarray(anchor["pair_valid"]).tolist() == [True] * 5 + [False]
  assert ret["outputs_fine_anchor_dy"]["occ_weights"].shape == (4, n_total)


def test_ff_loss_and_gradient_partition():
  """Coarse grads exactly zero (stop_gradient in the render core), fine
  grads materially nonzero."""
  _, model, state, _, rb, weights = _setup()

  def loss_fn(params):
    coarse_fm, fine_fm = compute_ff_featmaps(model, params, rb)
    ret = render_rays_mv(model, params, rb, coarse_fm, fine_fm, CFG,
                         det=False, is_train=True,
                         rng=jax.random.PRNGKey(5), needs_grad=True)
    return losses_lib.compute_ff_losses(ret, rb, weights)["loss"]

  grads = jax.jit(jax.grad(loss_fn))(state.params)
  for key in FF_COARSE_KEYS:
    leaves = jax.tree_util.tree_leaves(grads[key])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in leaves), key
  for key in ("net_fine_st", "net_fine_dy", "feature_net_fine",
              "motion_mlp_fine"):
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads[key]))
    assert total > 0.0, key


def test_ff_train_step_freezes_coarse():
  _, model, state, tx, rb, weights = _setup()
  step = make_ff_train_step(model, tx, CFG, donate=False)
  before = jax.device_get(state.params)
  state2, metrics = step(state, rb, weights, jax.random.PRNGKey(7))
  assert np.isfinite(float(metrics["loss"]))
  assert np.isfinite(float(metrics["psnr"]))
  after = jax.device_get(state2.params)
  for key in FF_COARSE_KEYS:
    for a, b in zip(jax.tree_util.tree_leaves(before[key]),
                    jax.tree_util.tree_leaves(after[key])):
      np.testing.assert_array_equal(a, b, err_msg=key)
  changed = any(
      float(np.abs(a - b).max()) > 0
      for a, b in zip(jax.tree_util.tree_leaves(before["net_fine_dy"]),
                      jax.tree_util.tree_leaves(after["net_fine_dy"])))
  assert changed


def test_ff_train_step_bf16_fused_split():
  """The production bf16 + fused config trains the FF fine stage through
  the split Pallas backwards (dynamic with coarse+fine sample counts AND
  static; CFG's mask_rgb=False covers the unmasked static branch)."""
  import dataclasses
  cfg = dataclasses.replace(CFG, compute_dtype="bfloat16",
                            fused_aggregators=True,
                            fused_aggregators_train=True)
  config, _, state, tx, rb, weights = _setup()
  model = FFModel(cfg=cfg, num_frames=NUM_FRAMES)
  step = make_ff_train_step(model, tx, cfg, donate=False)
  before = jax.device_get(state.params)
  state2, metrics = step(state, rb, weights, jax.random.PRNGKey(9))
  assert np.isfinite(float(metrics["loss"]))
  after = jax.device_get(state2.params)
  for key in FF_COARSE_KEYS:
    for a, b in zip(jax.tree_util.tree_leaves(before[key]),
                    jax.tree_util.tree_leaves(after[key])):
      np.testing.assert_array_equal(a, b, err_msg=key)
  assert any(
      float(np.abs(a - b).max()) > 0
      for a, b in zip(jax.tree_util.tree_leaves(before["net_fine_dy"]),
                      jax.tree_util.tree_leaves(after["net_fine_dy"])))


def test_nvidia_train_sampler_and_driver_pieces(tmp_path):
  """On-disk FF training data path: synthetic scene -> NvidiaSceneData
  train batch -> one fine-stage step; plus coarse_dir .pth loading."""
  from dynibar_tpu.data.synthetic_scene import write_synthetic_scene
  from dynibar_tpu.data.nvidia import NvidiaSceneData

  scene = write_synthetic_scene(str(tmp_path), num_frames=12, height=32,
                                width=48)
  config = DynibarConfig(folder_path=str(tmp_path),
                         N_samples=CFG.n_samples,
                         N_importance=CFG.n_importance,
                         num_basis=CFG.num_basis, mask_static=False)
  data = NvidiaSceneData(config, scene, cfg=CFG, height=32)
  rng = np.random.RandomState(0)
  rb = data.sample_batch(rng, n_rays=4)
  assert rb["src_rgbs"].shape[0] == 7
  assert rb["anchor_src_rgbs"].shape[0] == CFG.num_views_anchor
  assert rb["static_src_rgbs"].shape[0] == CFG.num_views_static
  assert "disp" not in rb            # Nvidia scenes carry no disp GT
  # flows ride in SOURCE-VIEW order (FF_SRC_OFFSETS, 7 views incl. the
  # unsupervised offset-0 row) so render_flows[v] pairs with flows[v]
  assert rb["flows"].shape == (7, 4, 2)
  assert float(rb["flow_masks"][3].sum()) == 0.0   # offset 0 never supervised

  model = FFModel(cfg=CFG, num_frames=data.num_frames)
  state, tx = create_ff_train_state(model, config, jax.random.PRNGKey(0))
  step = make_ff_train_step(model, tx, CFG, donate=False)
  jb = {k: jnp.asarray(v) for k, v in rb.items()}
  weights = losses_lib.schedule_weights(config, 0)
  _, metrics = step(state, jb, weights, jax.random.PRNGKey(1))
  assert np.isfinite(float(metrics["loss"]))


def test_ff_coarse_train_step_trains_coarse_freezes_fine():
  """Coarse-stage FF training (the run that produces the frozen checkpoint
  the reference only ships as data): loss finite, coarse groups move, fine
  groups bit-frozen, mono-loss key layout produced."""
  from dynibar_tpu.render.render_rays import render_rays_ff_coarse
  from dynibar_tpu.train.trainer import (compute_ff_coarse_featmaps,
                                         make_ff_coarse_optimizer,
                                         make_ff_coarse_train_step)

  config = DynibarConfig(N_samples=CFG.n_samples,
                         N_importance=CFG.n_importance,
                         num_basis=CFG.num_basis, lrate_mlp=1e-3,
                         lrate_feature=1e-3, lrate_decay_steps=100)
  model = FFModel(cfg=CFG, num_frames=NUM_FRAMES)
  params = model.init_params(jax.random.PRNGKey(0))
  rb = {k: jnp.asarray(v) for k, v in synthetic_ff_batch(
      CFG, n_rays=4, h=32, w=48, num_frames=NUM_FRAMES, ref_idx=10).items()}
  weights = losses_lib.schedule_weights(config, 0)

  fm = compute_ff_coarse_featmaps(model, params, rb)
  ret = render_rays_ff_coarse(model, params, rb, fm, CFG, det=False,
                              is_train=True, rng=jax.random.PRNGKey(2))
  for key in ("outputs_coarse_ref", "outputs_coarse_ref_dy",
              "outputs_coarse_anchor", "outputs_coarse_anchor_dy"):
    assert key in ret and ret[key] is not None
  m = losses_lib.compute_mono_losses(ret, rb, weights)
  assert np.isfinite(float(m["loss"]))

  tx = make_ff_coarse_optimizer(config)
  from dynibar_tpu.train.trainer import TrainState
  state = TrainState(params=params, opt_state=tx.init(params),
                     step=jnp.zeros((), jnp.int32))
  step = make_ff_coarse_train_step(model, tx, CFG, donate=False)
  state2, metrics = step(state, rb, weights, jax.random.PRNGKey(3))
  assert np.isfinite(float(metrics["loss"]))

  fine_keys = ("net_fine_st", "net_fine_dy", "feature_net_fine",
               "motion_mlp_fine", "traj_basis_fine")
  for key in fine_keys:
    for a, b in zip(jax.tree_util.tree_leaves(state.params[key]),
                    jax.tree_util.tree_leaves(state2.params[key])):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  moved = 0.0
  for key in FF_COARSE_KEYS:
    for a, b in zip(jax.tree_util.tree_leaves(state.params[key]),
                    jax.tree_util.tree_leaves(state2.params[key])):
      moved += float(np.abs(np.asarray(a) - np.asarray(b)).sum())
  assert moved > 0.0


def test_load_coarse_params_from_pth(tmp_path):
  """cli/train_ff.load_coarse_params converts a reference-format coarse
  .pth into the frozen subtree."""
  import torch
  from dynibar_tpu.cli.train_ff import load_coarse_params

  model = FFModel(cfg=CFG, num_frames=NUM_FRAMES)
  donor = model.init_params(jax.random.PRNGKey(2))

  # re-use the synthetic torch state-dict builders from the roundtrip test
  from test_ckpt_convert_roundtrip import (_dynamic_sd, _featnet_sd,
                                           _motion_sd, _static_sd)
  path = str(tmp_path / "coarse.pth")
  torch.save({
      "net_coarse_st": _static_sd(), "net_coarse_dy": _dynamic_sd(),
      "feature_net": _featnet_sd(), "motion_mlp": _motion_sd(),
      "traj_basis": torch.randn(NUM_FRAMES, CFG.num_basis),
      "global_step": 0,
  }, path)
  coarse = load_coarse_params(path)
  assert set(coarse) == set(FF_COARSE_KEYS)
  ref_shapes = jax.tree_util.tree_map(lambda x: jnp.shape(x),
                                      donor["feature_net"])
  got_shapes = jax.tree_util.tree_map(lambda x: np.shape(x),
                                      coarse["feature_net"])
  assert ref_shapes == got_shapes


def test_create_ff_state_grafts_coarse():
  config = DynibarConfig(N_samples=CFG.n_samples,
                         N_importance=CFG.n_importance,
                         num_basis=CFG.num_basis)
  model = FFModel(cfg=CFG, num_frames=NUM_FRAMES)
  donor = model.init_params(jax.random.PRNGKey(9))
  coarse = {k: donor[k] for k in FF_COARSE_KEYS}
  state, _ = create_ff_train_state(model, config, jax.random.PRNGKey(0),
                                   coarse_params=coarse)
  for key in FF_COARSE_KEYS:
    for a, b in zip(jax.tree_util.tree_leaves(state.params[key]),
                    jax.tree_util.tree_leaves(donor[key])):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
