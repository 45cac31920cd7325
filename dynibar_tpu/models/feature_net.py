"""2D feature extractor.

Rebuild of the *effective* forward path of the reference ``ResNet``
(ibrnet/feature_network.py:179-311): conv1(7×7, s2, reflect) → IN → ReLU →
layer1 (three BasicBlocks, first strided with a 1×1 downsample) → 1×1
out_conv → channel split into (coarse, fine) feature maps at 1/4 resolution.

The reference also *constructs* layer2/3 and an upconv decoder that its
forward never touches (feature_network.py:232-246 — dead code); we do not
port dead weights, but the checkpoint-conversion shim in
``dynibar_tpu.utils.torch_convert`` knows to skip them.

Layout is NHWC (TPU-native); images come in as [V, H, W, 3].
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynibar_tpu.models.nn_layers import InstanceNorm, TorchConv


class BasicBlock(nn.Module):
  """ResNet BasicBlock with InstanceNorm + reflect padding
  (reference feature_network.py:41-84)."""

  planes: int
  stride: int = 1
  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x):
    identity = x
    out = TorchConv(self.planes, 3, self.stride, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
    out = InstanceNorm(name="bn1")(out)
    out = jax.nn.relu(out)
    out = TorchConv(self.planes, 3, 1, use_bias=False, dtype=self.dtype,
                    name="conv2")(out)
    out = InstanceNorm(name="bn2")(out)
    if self.stride != 1 or x.shape[-1] != self.planes:
      identity = TorchConv(self.planes, 1, self.stride, use_bias=False,
                           dtype=self.dtype, name="downsample_conv")(x)
      identity = InstanceNorm(name="downsample_norm")(identity)
    return jax.nn.relu(out + identity)


class FeatureNet(nn.Module):
  """conv1 + layer1 + out_conv encoder producing (coarse, fine) maps.

  compute_dtype=bf16 runs the convs in bf16 with f32 accumulation;
  InstanceNorm statistics stay f32 either way.
  """

  coarse_out_ch: int = 32
  fine_out_ch: int = 32
  compute_dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [V, H, W, 3] in [0, 1] -> ([V, H/4, W/4, Cc], [V, H/4, W/4, Cf])."""
    dt = self.compute_dtype
    out_ch = self.coarse_out_ch + self.fine_out_ch
    x = TorchConv(64, 7, 2, use_bias=False, dtype=dt, name="conv1")(x)
    x = InstanceNorm(name="bn1")(x)
    x = jax.nn.relu(x)
    x = BasicBlock(64, stride=2, dtype=dt, name="layer1_0")(x)
    x = BasicBlock(64, stride=1, dtype=dt, name="layer1_1")(x)
    x = BasicBlock(64, stride=1, dtype=dt, name="layer1_2")(x)
    x = TorchConv(out_ch, 1, 1, use_bias=True, dtype=dt, name="out_conv")(x)
    # channel split (reference feature_network.py:308-310)
    return x[..., :self.coarse_out_ch], x[..., -self.fine_out_ch:]
