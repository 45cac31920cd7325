"""Eval-harness pieces testable without benchmark data on disk."""

import numpy as np
import pytest

from dynibar_tpu.eval.nvidia_eval import MetricAccumulator
from dynibar_tpu.eval.metrics import masked_psnr


def test_metric_accumulator_means_and_missing_lpips():
  acc = MetricAccumulator()
  acc.add(30.0, 0.9, None)
  acc.add(32.0, 0.95, None)
  m = acc.means()
  assert m["psnr"] == pytest.approx(31.0)
  assert m["ssim"] == pytest.approx(0.925)
  assert np.isnan(m["lpips"])  # no LPIPS weights -> nan, not a lie

  acc2 = MetricAccumulator()
  acc2.add(30.0, 0.9, 0.12)
  assert acc2.means()["lpips"] == pytest.approx(0.12)


def test_eval_protocol_skips_time_aligned_viewpoint():
  # reference eval_nvidia.py:317: skip cam == img_i % 12
  from dynibar_tpu.data.nvidia import NUM_VIEWPOINTS
  evaluated = [(f, c) for f in range(3, 9) for c in range(NUM_VIEWPOINTS)
               if f % NUM_VIEWPOINTS != c]
  per_frame = {}
  for f, c in evaluated:
    per_frame.setdefault(f, []).append(c)
  assert all(len(v) == 11 for v in per_frame.values())
  for f, cams in per_frame.items():
    assert f % NUM_VIEWPOINTS not in cams


def test_masked_psnr_matches_unmasked_on_full_mask():
  rng = np.random.RandomState(0)
  a = rng.rand(16, 16, 3)
  b = np.clip(a + 0.05 * rng.randn(16, 16, 3), 0, 1)
  mask = np.ones_like(a)
  p = masked_psnr(a, b, mask)
  mse = np.mean((a - b) ** 2)
  assert p == pytest.approx(10 * np.log10(1.0 / mse), rel=1e-6)
