"""Compiled (Mosaic, bf16) fused-kernel parity on REAL TPU hardware.

The default suite runs the Pallas kernels in interpret mode on CPU, where
everything upcasts to f32 — the numerics of the *compiled* bf16 kernels are
otherwise only smoke-tested for finiteness (ADVICE round-1).  These tests
compare the compiled kernels against the f32 flax reference at the same
tolerances the interpret-mode suite uses.

Run on hardware with:  DYNIBAR_TPU_TESTS=1 python -m pytest \
    tests/test_tpu_compiled_parity.py -q
(conftest keeps the accelerator backend when DYNIBAR_TPU_TESTS=1; skipped
everywhere else.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynibar_tpu.models.aggregators import DynamicAggregator, StaticAggregator
from dynibar_tpu.ops.pallas_agg import (fused_dynamic_aggregator,
                                        fused_static_aggregator)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-kernel parity needs real TPU (DYNIBAR_TPU_TESTS=1)")

R, S, V, F = 128, 64, 7, 32


@pytest.fixture(scope="module")
def inputs():
  ks = jax.random.split(jax.random.PRNGKey(0), 10)
  return dict(
      pts=jax.random.normal(ks[0], (R, S, 3)),
      ref_pl=jax.random.normal(ks[1], (R, 6)),
      src_pl=jax.random.normal(ks[2], (R, S, V, 6)),
      rgb_feat=jax.random.uniform(ks[3], (R, S, V, F + 3)),
      ray_dir=jax.random.normal(ks[4], (R, 3)),
      ray_diff=jax.random.normal(ks[5], (R, S, V, 4)) * 0.1,
      time_diff=jnp.zeros((R, S, V, 1)),
      mask=(jax.random.uniform(ks[6], (R, S, V, 1)) > 0.2)
      .astype(jnp.float32),
      time=jnp.full((R, S, 1), 0.37),
      k_st=ks[7], k_dy=ks[8],
  )


def test_compiled_static_matches_flax_f32(inputs):
  st = StaticAggregator(in_feat_ch=F, n_samples=S)
  p = st.init(inputs["k_st"], inputs["pts"], inputs["ref_pl"],
              inputs["src_pl"], inputs["rgb_feat"], inputs["ray_dir"],
              inputs["ray_diff"], inputs["mask"])["params"]
  ref = np.asarray(st.apply(
      {"params": p}, inputs["pts"], inputs["ref_pl"], inputs["src_pl"],
      inputs["rgb_feat"], inputs["ray_dir"], inputs["ray_diff"],
      inputs["mask"]), np.float32)
  got = np.asarray(fused_static_aggregator(
      p, inputs["pts"], inputs["ref_pl"], inputs["src_pl"],
      inputs["rgb_feat"], inputs["ray_dir"], inputs["ray_diff"],
      inputs["mask"], interpret=False), np.float32)
  assert got.shape == (R, S, 4)
  np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_compiled_dynamic_matches_flax_f32(inputs):
  dy = DynamicAggregator(in_feat_ch=F, n_samples=S, shift=5.0)
  p = dy.init(inputs["k_dy"], inputs["pts"], inputs["rgb_feat"],
              inputs["ray_dir"], inputs["ray_diff"], inputs["time_diff"],
              inputs["mask"], inputs["time"])["params"]
  ref = np.asarray(dy.apply(
      {"params": p}, inputs["pts"], inputs["rgb_feat"], inputs["ray_dir"],
      inputs["ray_diff"], inputs["time_diff"], inputs["mask"],
      inputs["time"]), np.float32)
  got = np.asarray(fused_dynamic_aggregator(
      p, inputs["pts"], inputs["rgb_feat"], inputs["ray_dir"],
      inputs["ray_diff"], inputs["time_diff"], inputs["mask"],
      inputs["time"], shift=5.0, n_samples=S, interpret=False), np.float32)
  assert got.shape == (R, S, 4)
  np.testing.assert_allclose(got, ref, atol=1e-2, rtol=2e-2)


def test_compiled_dynamic_masked_rows(inputs):
  """All-invalid points through the compiled kernel: sigma == -1e9 exactly
  (masked_fill replacement semantics), rgb == 0."""
  mask = inputs["mask"].at[:4].set(0.0)
  dy = DynamicAggregator(in_feat_ch=F, n_samples=S, shift=5.0)
  p = dy.init(inputs["k_dy"], inputs["pts"], inputs["rgb_feat"],
              inputs["ray_dir"], inputs["ray_diff"], inputs["time_diff"],
              mask, inputs["time"])["params"]
  got = np.asarray(fused_dynamic_aggregator(
      p, inputs["pts"], inputs["rgb_feat"], inputs["ray_dir"],
      inputs["ray_diff"], inputs["time_diff"], mask, inputs["time"],
      shift=5.0, n_samples=S, interpret=False), np.float32)
  np.testing.assert_array_equal(got[:4, :, 3], -1e9)
  np.testing.assert_array_equal(got[:4, :, :3], 0.0)
