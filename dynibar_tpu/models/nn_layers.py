"""Small Flax building blocks with torch-default initialization.

Training-dynamics parity matters for reproducing the reference's training
recipe, so Dense/Conv layers initialize like ``torch.nn.Linear`` /
``torch.nn.Conv2d`` defaults: kaiming_uniform(a=√5) on the kernel and
U(-1/√fan_in, 1/√fan_in) on the bias — both reduce to the same bound
1/√fan_in.  (Reference modules rely on torch defaults; the ``weights_init``
helper at mlp_network.py:107-112 is defined but never applied.)
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_bound(bound: float):
  def init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)
  return init


# This backend defaults matmuls to fast-bf16 MXU passes.  Parameters and
# activations are f32; we request full-precision accumulation explicitly and
# let the performance pass opt into bf16 *dtypes* (not silent truncation).
HIGHEST = jax.lax.Precision.HIGHEST


class TorchDense(nn.Module):
  """nn.Linear with torch default init. Kernel layout [in, out].

  ``dtype`` selects the compute dtype: None keeps f32 activations with
  full-precision (6-pass) MXU matmuls for bit-parity; ``jnp.bfloat16`` casts
  activations+weights to bf16 (1-pass MXU, half the HBM traffic) with f32
  accumulation — the deliberate mixed-precision mode.  Params stay f32.
  """

  features: int
  use_bias: bool = True
  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x):
    fan_in = x.shape[-1]
    bound = 1.0 / math.sqrt(fan_in)
    kernel = self.param("kernel", _uniform_bound(bound),
                        (fan_in, self.features))
    if self.dtype is not None:
      y = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype),
                     preferred_element_type=self.dtype)
    else:
      y = jnp.matmul(x, kernel, precision=HIGHEST)
    if self.use_bias:
      bias = self.param("bias", _uniform_bound(bound), (self.features,))
      y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
    return y


class MLP(nn.Module):
  """Sequential Dense stack with an activation between (and optionally after)
  layers — mirrors the reference's nn.Sequential MLPs."""

  features: Sequence[int]
  activation: Callable = jax.nn.elu
  activate_final: bool = False
  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x):
    for i, f in enumerate(self.features):
      x = TorchDense(f, dtype=self.dtype, name=f"dense_{i}")(x)
      if i < len(self.features) - 1 or self.activate_final:
        x = self.activation(x)
    return x


def reflect_pad_conv(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                     pad: int, dtype=None) -> jnp.ndarray:
  """2D conv with reflect padding, NHWC x HWIO."""
  if pad > 0:
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
  if dtype is not None:
    # keep the output in `dtype` so the transposed convs of autodiff see
    # uniform operand dtypes; InstanceNorm upcasts for statistics
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
  return jax.lax.conv_general_dilated(
      x, kernel, window_strides=(stride, stride), padding="VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HIGHEST)


class TorchConv(nn.Module):
  """nn.Conv2d with reflect padding and torch default init (NHWC).

  dtype=bf16 casts input+kernel to bf16 with f32 accumulation (fast MXU
  path); None keeps full-precision f32 convs for bit-parity.
  """

  features: int
  kernel_size: int
  stride: int = 1
  use_bias: bool = True
  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x):
    in_ch = x.shape[-1]
    k = self.kernel_size
    fan_in = in_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    kernel = self.param("kernel", _uniform_bound(bound),
                        (k, k, in_ch, self.features))
    y = reflect_pad_conv(x, kernel, self.stride, (k - 1) // 2,
                         dtype=self.dtype)
    if self.use_bias:
      bias = self.param("bias", _uniform_bound(bound), (self.features,))
      y = y + bias
    return y


class InstanceNorm(nn.Module):
  """InstanceNorm2d(affine=True, track_running_stats=False), NHWC.

  Normalizes each (sample, channel) over H, W with eps=1e-5 like torch.
  """

  epsilon: float = 1e-5

  @nn.compact
  def __call__(self, x):
    c = x.shape[-1]
    scale = self.param("scale", nn.initializers.ones, (c,))
    bias = self.param("bias", nn.initializers.zeros, (c,))
    # statistics always in f32 (bf16 means over thousands of pixels drift)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
    return (y * scale + bias).astype(x.dtype)
