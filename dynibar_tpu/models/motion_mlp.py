"""Motion-trajectory coefficient MLP.

Rebuild of the reference ``MotionMLP`` (ibrnet/mlp_network.py:558-618):
8×256 ReLU MLP over xyzt positional encodings (16 *linearly spaced*
frequencies — the one place the reference uses linspace=True), a skip
concatenation after layer 4, and a zero-initialized coefficient head so
trajectories start at identity.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynibar_tpu.core.posenc import periodic_embed
from dynibar_tpu.models.nn_layers import TorchDense


class MotionMLP(nn.Module):
  num_basis: int = 6
  depth: int = 8
  width: int = 256
  num_freqs: int = 16
  skips: Sequence[int] = (4,)
  sf_mag_div: float = 1.0

  @nn.compact
  def __call__(self, xyzt: jnp.ndarray) -> jnp.ndarray:
    """xyzt: [..., 4] -> DCT coefficients [..., num_basis * 3]."""
    inputs = periodic_embed(xyzt, max_freq=self.num_freqs,
                            n_freq=self.num_freqs, linspace=True)
    h = inputs
    for i in range(self.depth):
      h = TorchDense(self.width, name=f"pts_linears_{i}")(h)
      h = jax.nn.relu(h)
      if i in self.skips:
        h = jnp.concatenate([inputs, h], axis=-1)
    coeff_kernel = self.param(
        "coeff_kernel", nn.initializers.zeros,
        (h.shape[-1], self.num_basis * 3))
    coeff_bias = self.param(
        "coeff_bias", nn.initializers.zeros, (self.num_basis * 3,))
    return (h @ coeff_kernel + coeff_bias) / self.sf_mag_div
