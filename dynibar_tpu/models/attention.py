"""Ray transformer: multi-head attention along the sample axis.

Parity with the reference ``MultiHeadAttention`` /
``ScaledDotProductAttention`` (ibrnet/mlp_network.py:13-104): 4 heads,
d_model=128, d_k=d_v=32, no-bias projections, residual + LayerNorm(eps=1e-6),
and the reference's query-row masking semantics — the [B, Lq, 1] mask
broadcasts over keys, so invalid *queries* get uniform attention while keys
are never masked.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynibar_tpu.models.nn_layers import TorchDense


class RayTransformer(nn.Module):
  n_head: int = 4
  d_model: int = 128
  d_k: int = 32
  d_v: int = 32
  dtype: Optional[Any] = None  # bf16 projections; softmax always f32

  @nn.compact
  def __call__(self, q, k, v, mask=None):
    """q/k/v: [B, L, d_model]; mask: [B, L, 1] (1=valid query) or None."""
    b, lq, _ = q.shape
    residual = q

    qh = TorchDense(self.n_head * self.d_k, use_bias=False,
                    dtype=self.dtype, name="w_qs")(q)
    kh = TorchDense(self.n_head * self.d_k, use_bias=False,
                    dtype=self.dtype, name="w_ks")(k)
    vh = TorchDense(self.n_head * self.d_v, use_bias=False,
                    dtype=self.dtype, name="w_vs")(v)

    qh = qh.reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
    kh = kh.reshape(b, -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)
    vh = vh.reshape(b, -1, self.n_head, self.d_v).transpose(0, 2, 1, 3)

    prec = (None if self.dtype is not None
            else jax.lax.Precision.HIGHEST)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (self.d_k ** 0.5), kh,
                      precision=prec,
                      preferred_element_type=jnp.float32)
    if mask is not None:
      # [B, L, 1] -> [B, 1, L, 1]: masks query rows, broadcast over keys
      m = mask[:, None, :, :]
      attn = jnp.where(m == 0, -1e9, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    if self.dtype is not None:
      attn = attn.astype(self.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh, precision=prec)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
    out = TorchDense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="fc")(out)
    out = out.astype(jnp.float32) + residual.astype(jnp.float32)
    out = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(out)
    return out if self.dtype is None else out.astype(self.dtype)
