"""Fourier positional encodings.

Behavioral parity with the reference's ``PeriodicEmbed``
(reference: ibrnet/mlp_network.py:530-555): output layout is
``[x, cos(f1 x) .. cos(fN x), sin(f1 x) .. sin(fN x)]`` concatenated on the
last axis, with per-frequency blocks interleaved across input channels the
same way torch.cat does (each frequency emits a full copy of the channels).

Two frequency ladders exist in the reference:
  * geometric: ``2**linspace(0, N-1, N)``  (linspace=False)
  * linear:    ``linspace(1, max_freq+1, N)`` (linspace=True; used only by
    the MotionMLP xyzt embedding, reference mlp_network.py:589)
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _freqs(max_freq: int, n_freq: int, linspace: bool) -> np.ndarray:
  if linspace:
    return np.linspace(1.0, max_freq + 1.0, n_freq).astype(np.float32)
  exps = np.linspace(0.0, n_freq - 1.0, n_freq).astype(np.float32)
  return (2.0 ** exps).astype(np.float32)


def periodic_embed(x: jnp.ndarray, max_freq: int, n_freq: int,
                   linspace: bool = True) -> jnp.ndarray:
  """[..., C] -> [..., C * (2 * n_freq + 1)] with [x, cos..., sin...] layout."""
  freqs = jnp.asarray(_freqs(max_freq, n_freq, linspace))
  # [..., F, C]: scale each channel by each frequency
  xs = x[..., None, :] * freqs[:, None]
  shape = x.shape[:-1] + (n_freq * x.shape[-1],)
  cos = jnp.cos(xs).reshape(shape)
  sin = jnp.sin(xs).reshape(shape)
  return jnp.concatenate([x, cos, sin], axis=-1)


def embed_dim(in_dim: int, n_freq: int) -> int:
  return in_dim * (2 * n_freq + 1)


@functools.lru_cache(maxsize=None)
def sample_axis_posenc(d_hid: int, n_samples: int) -> np.ndarray:
  """Sinusoid table over the sample axis for the ray transformer.

  Parity with the reference's ``posenc`` (mlp_network.py:220-234):
  ``table[pos, 2i] = sin(pos / 10000^(2i/d))``,
  ``table[pos, 2i+1] = cos(pos / 10000^(2i/d))``.
  """
  pos = np.arange(n_samples)[:, None].astype(np.float64)
  hid = np.arange(d_hid)[None, :]
  angle = pos / np.power(10000.0, 2.0 * (hid // 2) / d_hid)
  table = np.zeros((n_samples, d_hid), dtype=np.float64)
  table[:, 0::2] = np.sin(angle[:, 0::2])
  table[:, 1::2] = np.cos(angle[:, 1::2])
  return table.astype(np.float32)
