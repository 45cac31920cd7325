"""Golden-value tests for the numeric core against independent references
(numpy re-derivations and torch CPU where the semantics are torch-defined)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynibar_tpu.core import posenc, sampling
from dynibar_tpu.core.motion import init_dct_basis
from dynibar_tpu.ops.distortion import eff_distloss, eff_distloss_pairwise
from dynibar_tpu.ops.grid_sample import bilinear_sample


def test_periodic_embed_matches_reference_layout():
  import torch
  x = np.random.RandomState(0).randn(5, 3).astype(np.float32)

  # replicate reference PeriodicEmbed (mlp_network.py:530-555)
  def torch_embed(x_t, max_freq, n_freq, linspace):
    if linspace:
      freqs = torch.linspace(1, max_freq + 1, steps=n_freq)
    else:
      exps = torch.linspace(0, n_freq - 1, steps=n_freq)
      freqs = 2 ** exps
    out = [x_t]
    for f in [torch.cos, torch.sin]:
      for fr in freqs:
        out.append(f(fr * x_t))
    return torch.cat(out, -1)

  for linspace, mf, nf in [(True, 16, 16), (False, 5, 5), (False, 10, 10)]:
    got = posenc.periodic_embed(jnp.asarray(x), mf, nf, linspace)
    want = torch_embed(torch.from_numpy(x), mf, nf, linspace).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_sample_axis_posenc_matches_reference():
  # replicate mlp_network.py:220-234
  d_hid, n = 128, 64
  def ref_table():
    def vec(pos):
      return [pos / np.power(10000, 2 * (j // 2) / d_hid)
              for j in range(d_hid)]
    table = np.array([vec(p) for p in range(n)])
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)
  np.testing.assert_allclose(posenc.sample_axis_posenc(d_hid, n), ref_table(),
                             rtol=1e-6)


def test_dct_basis_matches_loop():
  T, K = 24, 6
  want = np.zeros([T, K])
  for t in range(T):
    for k in range(1, K + 1):
      want[t, k - 1] = np.sqrt(2.0 / T) * np.cos(
          np.pi / (2.0 * T) * (2 * t + 1) * k)
  np.testing.assert_allclose(init_dct_basis(K, T), want, rtol=1e-5, atol=1e-6)


def _ref_sample_pdf_numpy(bins, weights, n_samples, u):
  """Direct numpy port of the reference loop (render_ray.py:19-64)."""
  m = weights.shape[1]
  weights = weights + 1e-5
  pdf = weights / weights.sum(-1, keepdims=True)
  cdf = np.cumsum(pdf, -1)
  cdf = np.concatenate([np.zeros_like(cdf[:, :1]), cdf], -1)
  above = np.zeros_like(u, dtype=np.int64)
  for i in range(m):
    above += (u >= cdf[:, i:i + 1]).astype(np.int64)
  below = np.clip(above - 1, 0, None)
  cdf_g0 = np.take_along_axis(cdf, below, -1)
  cdf_g1 = np.take_along_axis(cdf, above, -1)
  bins_g0 = np.take_along_axis(bins, below, -1)
  bins_g1 = np.take_along_axis(bins, above, -1)
  denom = cdf_g1 - cdf_g0
  denom = np.where(denom < 1e-5, 1.0, denom)
  t = (u - cdf_g0) / denom
  return bins_g0 + t * (bins_g1 - bins_g0)


def test_sample_pdf_matches_reference_det():
  rng = np.random.RandomState(1)
  r, m, n = 4, 63, 64
  bins = np.sort(rng.rand(r, m + 1), axis=-1).astype(np.float32)
  weights = rng.rand(r, m).astype(np.float32)
  u = np.broadcast_to(np.linspace(0, 1, n, dtype=np.float32), (r, n)).copy()
  want = _ref_sample_pdf_numpy(bins.copy(), weights.copy(), n, u)
  got = sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n,
                            det=True)
  np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_stratified_sampling_bounds_and_svals():
  rng = jax.random.PRNGKey(0)
  ray_o = jnp.zeros((8, 3))
  ray_d = jnp.ones((8, 3))
  dr = jnp.array([2.0, 10.0])
  pts, z, s = sampling.sample_along_ray(ray_o, ray_d, dr, 32,
                                        inv_uniform=True, det=False, rng=rng)
  assert z.shape == (8, 32)
  assert float(z.min()) >= 2.0 - 1e-4 and float(z.max()) <= 10.0 + 1e-4
  # s_vals normalized: s(near)=0, s(far)=1
  np.testing.assert_allclose(np.asarray(sampling.z_to_s(dr[0], dr[0], dr[1])),
                             0.0, atol=1e-6)
  np.testing.assert_allclose(np.asarray(sampling.z_to_s(dr[1], dr[0], dr[1])),
                             1.0, atol=1e-6)
  # deterministic inverse-depth: uniformly spaced in 1/z
  _, zd, _ = sampling.sample_along_ray(ray_o, ray_d, dr, 32,
                                       inv_uniform=True, det=True)
  inv = 1.0 / np.asarray(zd[0])
  np.testing.assert_allclose(np.diff(inv), np.diff(inv)[0] * np.ones(31),
                             rtol=1e-4)


def test_distortion_loss_closed_form_matches_pairwise():
  rng = np.random.RandomState(0)
  w = rng.rand(16, 63).astype(np.float32) * 0.02
  m = np.sort(rng.rand(16, 63).astype(np.float32), axis=-1)
  iv = rng.rand(16, 63).astype(np.float32) * 0.01
  a = eff_distloss(jnp.asarray(w), jnp.asarray(m), jnp.asarray(iv))
  b = eff_distloss_pairwise(jnp.asarray(w), jnp.asarray(m), jnp.asarray(iv))
  np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_bilinear_sample_matches_torch_grid_sample():
  import torch
  import torch.nn.functional as F
  rng = np.random.RandomState(0)
  h, w, c, n = 13, 17, 4, 200
  img = rng.rand(h, w, c).astype(np.float32)
  grid = (rng.rand(n, 2).astype(np.float32) * 2.4 - 1.2)  # incl. out-of-range

  got = bilinear_sample(jnp.asarray(img), jnp.asarray(grid))

  img_t = torch.from_numpy(img).permute(2, 0, 1)[None]          # [1,C,H,W]
  grid_t = torch.from_numpy(grid)[None, :, None, :]             # [1,N,1,2]
  want = F.grid_sample(img_t, grid_t, align_corners=True,
                       padding_mode="zeros")[0, :, :, 0].T.numpy()
  np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
