"""LPIPS perceptual metric (AlexNet backbone) in Flax.

Replaces the reference's external NSFF ``models.PerceptualLoss``
(eval_nvidia.py:16,289-291): AlexNet conv features at 5 stages,
channel-unit-normalized, squared difference re-weighted by learned 1×1
"lin" layers, spatially averaged (masked), summed over stages.

Weights are NOT bundled (zero-egress environment): load them once from a
torch LPIPS checkpoint via :func:`load_torch_lpips` (accepts the standard
``lpips`` package state_dict layout plus torchvision AlexNet features), or
pass your own params.  Without weights, :class:`LPIPSMetric` reports None so
eval tables degrade gracefully instead of lying.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# AlexNet "features" layout: (out_ch, kernel, stride, pad) per conv, with
# maxpools between stages as in torchvision
_ALEX_STAGES = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# ImageNet scaling used by LPIPS (shift/scale buffers of the torch module)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _AlexFeatures(nn.Module):
  """torchvision AlexNet.features, returning the 5 relu stage outputs."""

  @nn.compact
  def __call__(self, x):
    outs = []
    for i, (ch, k, s, p) in enumerate(_ALEX_STAGES):
      x = nn.Conv(ch, (k, k), strides=(s, s), padding=p,
                  name=f"conv{i}")(x)
      x = jax.nn.relu(x)
      outs.append(x)
      if i in (0, 1):
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
      if i == 4:
        pass
    return outs


class LPIPSNet(nn.Module):
  """Full LPIPS: normalize inputs, diff unit-normalized features, lin heads."""

  @nn.compact
  def __call__(self, img0, img1, mask=None):
    """img0/img1: [B, H, W, 3] in [-1, 1]; mask: [B, H, W, 1] or None."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    net = _AlexFeatures(name="alex")
    f0 = net((img0 - shift) / scale)
    f1 = net((img1 - shift) / scale)

    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
      a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
      b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
      diff = (a - b) ** 2
      w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
      if mask is None:
        total = total + jnp.mean(w, axis=(1, 2, 3))
      else:
        m = jax.image.resize(mask, w.shape[:3] + (1,), "nearest")
        total = total + (jnp.sum(w * m, axis=(1, 2, 3))
                         / (jnp.sum(m, axis=(1, 2, 3)) + 1e-8))
    return total


def load_torch_lpips(lpips_pth: str, alexnet_pth: str) -> Dict[str, Any]:
  """Convert torch LPIPS lin weights + torchvision AlexNet -> Flax params."""
  import torch
  lin_sd = torch.load(lpips_pth, map_location="cpu", weights_only=False)
  alex_sd = torch.load(alexnet_pth, map_location="cpu", weights_only=False)
  if hasattr(alex_sd, "state_dict"):
    alex_sd = alex_sd.state_dict()

  def conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))

  # torchvision features indices of the conv layers
  conv_idx = (0, 3, 6, 8, 10)
  alex = {}
  for i, ti in enumerate(conv_idx):
    alex[f"conv{i}"] = {
        "kernel": conv_w(alex_sd[f"features.{ti}.weight"]),
        "bias": np.asarray(alex_sd[f"features.{ti}.bias"]),
    }
  params = {"alex": alex}
  for i in range(5):
    key = f"lin{i}.model.1.weight"
    if key not in lin_sd:
      key = f"lins.{i}.model.1.weight"
    params[f"lin{i}"] = {"kernel": conv_w(lin_sd[key])}
  return params


class LPIPSMetric:
  """Callable masked-LPIPS metric; returns None when weights are missing."""

  def __init__(self, weights_dir: Optional[str] = None):
    self.params = None
    self._fn = None
    if weights_dir:
      lpips_pth = os.path.join(weights_dir, "alex.pth")
      alex_pth = os.path.join(weights_dir, "alexnet.pth")
      if os.path.exists(lpips_pth) and os.path.exists(alex_pth):
        self.params = load_torch_lpips(lpips_pth, alex_pth)
        net = LPIPSNet()
        self._fn = jax.jit(lambda p, a, b, m: net.apply({"params": p}, a, b, m))

  @property
  def available(self) -> bool:
    return self._fn is not None

  def __call__(self, img0: np.ndarray, img1: np.ndarray,
               mask: Optional[np.ndarray] = None) -> Optional[float]:
    """img0/img1: [H, W, 3] in [0, 1]; mask: [H, W] or [H, W, C]."""
    if self._fn is None:
      return None
    a = jnp.asarray(img0 * 2.0 - 1.0)[None]
    b = jnp.asarray(img1 * 2.0 - 1.0)[None]
    if mask is None:
      m = jnp.ones(a.shape[:3] + (1,))
    else:
      m = jnp.asarray(mask)
      if m.ndim == 3:
        m = m[..., :1]
      else:
        m = m[..., None]
      m = m[None]
    return float(self._fn(self.params, a, b, m)[0])
