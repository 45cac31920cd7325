"""Orbax checkpoint save / auto-resume round trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynibar_tpu.utils import checkpoints as ckpt


def _tree():
  return {"a": {"kernel": jnp.arange(6.0).reshape(2, 3)},
          "b": jnp.ones((4,)) * 2.5}


def test_save_load_roundtrip(tmp_path):
  out = str(tmp_path / "exp")
  params = _tree()
  opt_state = {"mu": jnp.zeros((4,))}
  path = ckpt.save_checkpoint(out, 1234, params, opt_state)
  payload = ckpt.load_checkpoint(path)
  assert int(payload["step"]) == 1234
  np.testing.assert_allclose(np.asarray(payload["params"]["a"]["kernel"]),
                             np.arange(6.0).reshape(2, 3))
  np.testing.assert_allclose(np.asarray(payload["opt_state"]["mu"]),
                             np.zeros(4))


def test_resume_picks_latest_and_respects_no_reload(tmp_path):
  out = str(tmp_path / "exp")
  ckpt.save_checkpoint(out, 10, _tree())
  ckpt.save_checkpoint(out, 20, _tree())
  payload, step = ckpt.resume_from(out)
  assert step == 20
  payload, step = ckpt.resume_from(out, no_reload=True)
  assert payload is None and step == 0
  payload, step = ckpt.resume_from(str(tmp_path / "nowhere"))
  assert payload is None and step == 0


def test_explicit_ckpt_path_wins(tmp_path):
  out = str(tmp_path / "exp")
  other = str(tmp_path / "other")
  ckpt.save_checkpoint(out, 5, _tree())
  explicit = ckpt.save_checkpoint(other, 99, _tree())
  payload, step = ckpt.resume_from(out, ckpt_path=explicit)
  assert step == 99


def test_prune_keeps_last_k(tmp_path):
  out = str(tmp_path / "exp")
  for s in (1, 2, 3, 4, 5):
    ckpt.save_checkpoint(out, s, _tree(), keep=3)
  latest = ckpt.latest_checkpoint(out)
  assert latest.endswith("00000005")
  import os
  snaps = [d for d in os.listdir(out) if d.startswith("model_")]
  assert len(snaps) == 3


def test_checkpoint_leaves_are_host_numpy(tmp_path):
  """Saved payloads must hold numpy leaves: device arrays serialize with
  their sharding, and a template-less restore in a fresh process (the
  render/serve CLIs' resume_from) then fails with "sharding ... Got
  None". Numpy leaves restore on any topology."""
  out = str(tmp_path / "exp")
  params = _tree()                       # jnp (device) leaves
  opt_state = {"mu": jnp.zeros((4,)), "count": jnp.int32(3)}
  path = ckpt.save_checkpoint(out, 7, params, opt_state)
  payload = ckpt.load_checkpoint(path)   # template-less, like the CLIs
  leaves = jax.tree_util.tree_leaves(
      {"p": payload["params"], "o": payload["opt_state"]})
  assert leaves and all(isinstance(l, np.ndarray) for l in leaves), [
      type(l) for l in leaves]
  np.testing.assert_allclose(payload["params"]["a"]["kernel"],
                             np.arange(6.0).reshape(2, 3))


def test_no_vv_snapshot_does_not_shadow_latest(tmp_path):
  """The one-shot `model_no-vv` snapshot (cli/train.py:209-214) must be
  invisible to latest_checkpoint("model"): "model_" is a prefix of
  "model_no-vv_" and 'n' sorts after every digit, so prefix matching made
  auto-resume rewind to the frozen snapshot forever after it was written."""
  out = str(tmp_path / "exp")
  ckpt.save_checkpoint(out, 1800, _tree(), name="model_no-vv")
  ckpt.save_checkpoint(out, 2000, _tree())
  latest = ckpt.latest_checkpoint(out)
  assert latest.endswith("model_00002000"), latest
  _, step = ckpt.resume_from(out)
  assert step == 2000
  # the no-vv snapshot is still addressable under its own name
  assert ckpt.latest_checkpoint(out, name="model_no-vv").endswith(
      "model_no-vv_00001800")
  # and regular pruning neither deletes it nor counts it toward keep
  for s in (2100, 2200, 2300):
    ckpt.save_checkpoint(out, s, _tree(), keep=3)
  import os
  snaps = sorted(d for d in os.listdir(out) if d.startswith("model_"))
  assert "model_no-vv_00001800" in snaps
  assert [d for d in snaps if "no-vv" not in d] == [
      "model_00002100", "model_00002200", "model_00002300"]


def test_ff_optimizer_freezes_coarse():
  from dynibar_tpu.config import DynibarConfig
  from dynibar_tpu.train.trainer import make_ff_optimizer
  config = DynibarConfig(lrate_mlp=1e-3, lrate_feature=1e-3)
  tx = make_ff_optimizer(config)
  params = {k: jnp.ones((2,)) for k in (
      "net_fine_st", "net_fine_dy", "feature_net_fine", "motion_mlp_fine",
      "traj_basis_fine", "net_coarse_st", "net_coarse_dy", "feature_net",
      "motion_mlp", "traj_basis")}
  grads = jax.tree_util.tree_map(jnp.ones_like, params)
  state = tx.init(params)
  updates, _ = tx.update(grads, state, params)
  for k in ("net_coarse_st", "net_coarse_dy", "feature_net", "motion_mlp",
            "traj_basis"):
    assert float(jnp.abs(updates[k]).max()) == 0.0, k
  for k in ("net_fine_st", "net_fine_dy", "feature_net_fine",
            "motion_mlp_fine", "traj_basis_fine"):
    assert float(jnp.abs(updates[k]).max()) > 0.0, k
