"""Grain loader: determinism + fallback behavior."""

import numpy as np

from dynibar_tpu.data.grain_pipeline import _SampleSource, make_grain_loader


class _FakeProvider:
  num_frames = 10

  def sample_batch(self, rng, n_rays, sample_mode="uniform"):
    return {"x": rng.rand(n_rays).astype(np.float32)}


def test_source_is_deterministic_per_index():
  src = _SampleSource(_FakeProvider(), n_rays=4, sample_mode="uniform",
                      seed=7)
  a = src[3]["x"]
  b = src[3]["x"]
  c = src[4]["x"]
  np.testing.assert_array_equal(a, b)
  assert not np.allclose(a, c)


def test_loader_yields_batches():
  loader = make_grain_loader(_FakeProvider(), n_rays=4, seed=0,
                             num_workers=0)
  batches = [next(iter_item for iter_item in [next(loader)])
             for _ in range(3)]
  assert all(b["x"].shape == (4,) for b in batches)
  # different steps -> different draws
  assert not np.allclose(batches[0]["x"], batches[1]["x"])
