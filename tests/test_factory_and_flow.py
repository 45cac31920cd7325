"""Dataset factory mixture + flow IO tests."""

import numpy as np
import pytest

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.data.factory import (DATASET_REGISTRY, MixtureDataset,
                                      create_training_dataset,
                                      register_dataset)
from dynibar_tpu.data.flow_io import warp_flow


class _FakeProvider:
  def __init__(self, tag):
    self.tag = tag
    self.num_frames = 10
    self.epoch = -1

  def set_epoch(self, epoch):
    self.epoch = epoch

  def sample_batch(self, rng, n_rays, sample_mode="uniform", pixel_rng=None):
    return {"tag": self.tag, "x": rng.rand(n_rays),
            "px": (rng if pixel_rng is None else pixel_rng).rand(n_rays)}


def test_mixture_weights_and_epoch_propagation():
  a, b = _FakeProvider("a"), _FakeProvider("b")
  mix = MixtureDataset([a, b], [0.9, 0.1])
  mix.set_epoch(7)
  assert a.epoch == b.epoch == 7
  rng = np.random.RandomState(0)
  tags = [mix.sample_batch(rng, 4)["tag"] for _ in range(200)]
  assert tags.count("a") > 150  # 0.9 weight dominates


def test_mixture_process_shared_views_disjoint_pixels():
  """Multi-host semantics: view-level draws are process-SHARED (replicated
  batch keys must be identical across hosts — the
  make_array_from_process_local_data contract) while pixel draws are
  per-process disjoint (the globally-sharded ray axis)."""
  a = _FakeProvider("a")
  m0 = MixtureDataset([a], [1.0], process_index=0, process_count=2)
  m1 = MixtureDataset([a], [1.0], process_index=1, process_count=2)
  b0 = m0.sample_batch(np.random.RandomState(5), 8)
  b1 = m1.sample_batch(np.random.RandomState(5), 8)
  assert np.allclose(b0["x"], b1["x"])        # shared view stream
  assert not np.allclose(b0["px"], b1["px"])  # disjoint pixel streams
  # single-process: pixel draws come from the main stream, unchanged
  s = MixtureDataset([a], [1.0]).sample_batch(np.random.RandomState(5), 8)
  assert not np.allclose(s["x"], s["px"])


def test_factory_unknown_dataset_is_clean_error():
  cfg = DynibarConfig(train_dataset="nope", train_scenes=["s"])
  with pytest.raises(SystemExit):
    create_training_dataset(cfg, process_index=0)


def test_factory_registry_custom():
  @register_dataset("fake_for_test")
  def _mk(config, scene):
    return _FakeProvider(scene)

  cfg = DynibarConfig(train_dataset="fake_for_test",
                      train_scenes=["s1", "s2"])
  mix = create_training_dataset(cfg, process_index=0)
  assert len(mix.providers) == 2
  del DATASET_REGISTRY["fake_for_test"]


def test_warp_flow_integer_shift():
  img = np.zeros((8, 8), np.float32)
  img[:, 5] = 1.0
  flow = np.zeros((8, 8, 2), np.float32)
  flow[..., 0] = 2.0  # sample from x+2
  out = warp_flow(img, flow)
  assert out[:, 3].min() == pytest.approx(1.0)  # column 5 appears at x=3
  assert out[:, 5].max() == pytest.approx(0.0)
