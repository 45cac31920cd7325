"""Hand-written Pallas backward for the fused dynamic aggregator.

After the fused-primal switch (ops/pallas_agg.attach_flax_grad), the
training step's dominant cost is the aggregator BACKWARD: the flax vjp
recomputes the module forward through HBM-round-tripping
[rays, samples, views, 128..256] intermediates and then transposes it the
same way.  This kernel computes the gradient of the fused forward's
math (bf16 matmuls, f32 accumulation/reductions) entirely in VMEM: one
grid step re-runs the forward for a tile of rays (activations stay in
registers/scratch) and immediately transposes it.

Gradient structure (mirrors pallas_agg._dynamic_kernel; see that kernel
for the forward notation):

  * dense y = W x + b  =>  dW += dy @ x^T (contract lanes), db += sum_N dy,
    dx = W^T dy; ELU' recovered from the stored POST-activation
    (y>0 ? 1 : y+1);
  * the two weighted mean/variance poolings couple views; with
    s = sum_v w_v (x_v - mean) the effective mean cotangent is
    d_mean_eff = d_mean - 2 d_var * s, then per view
    d_x_v = w_v d_mean_eff + 2 w_v (x_v - mean) d_var and
    d_w_v = <x_v, d_mean_eff> + <(x_v - mean)^2, d_var>  (channel dots);
  * pooling-1 weights (mask/msum) and pooling-2's 1/(vsum+eps) mask factor
    are functions of the VALIDITY MASKS ONLY on the mask side; every mask
    cotangent dies upstream (masks come from comparisons, whose vjp is
    zero), so d_w_v, d_minv, d_mask are never materialized — only
    d_vis_v (a sigmoid output) and d_vsum survive;
  * attention: softmax vjp per head with the block-diagonal mask zeroing
    off-block logit cotangents; additive masks drop out; per-head
    probabilities are recomputed in the transpose pass (cheaper than
    keeping 4 [N,N] f32 matrices live);
  * LayerNorm (channel axis): d_x = r (d_y - mean_c d_y
    - y_hat mean_c(d_y y_hat)).

Weight gradients accumulate across grid steps into revisited output
blocks (TPU grids execute sequentially): zero-initialized at
program_id 0, += every step.

The custom_vjp boundary sits at the packed-operand level
(pallas_agg.fused_dynamic_aggregator with pallas_bwd=True): cotangents
for the transposed bf16 weight copies chain back to the f32 parameter
pytree through the (differentiable) transpose/astype in the wrapper, and
the host-side time-MLP / PE segments get their gradients from ordinary
autodiff outside the kernel.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from dynibar_tpu.ops.pallas_agg import (_GEO_FREQS, _dense, _elu, _pe_rows,
                                        _sigmoid)


def _elu_from_post(y: jnp.ndarray) -> jnp.ndarray:
  """ELU'(pre) recovered from the post-activation: 1 if y>0 else y+1."""
  return jnp.where(y > 0, 1.0, y + 1.0)


def _mmdt(a, interpret):
  return a.astype(jnp.float32 if interpret else jnp.bfloat16)


def _dW(dy: jnp.ndarray, x_bf: jnp.ndarray, interpret: bool) -> jnp.ndarray:
  """dy [O,N] f32, x [I,N] bf16 -> dW [O,I] f32 (contract lanes)."""
  b = x_bf.astype(jnp.float32) if interpret else x_bf
  return lax.dot_general(_mmdt(dy, interpret), b, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)


def _dx(w_ref, dy: jnp.ndarray, interpret: bool) -> jnp.ndarray:
  """W [O,I] bf16, dy [O,N] f32 -> dx [I,N] f32 (contract out channels)."""
  w = w_ref[...]
  if interpret:
    w = w.astype(jnp.float32)
  return lax.dot_general(w, _mmdt(dy, interpret), (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)


def _db(dy: jnp.ndarray) -> jnp.ndarray:
  return jnp.sum(dy, axis=1, keepdims=True)


def _cdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  """Channel dot: sum_c a[c,n] b[c,n] -> [1,N]."""
  return jnp.sum(a * b, axis=0, keepdims=True)


def _mlp2_fwd_keep(w0, b0, w1, b1, x_bf, interpret, final_act):
  """mlp2 forward keeping the hidden post-activation for the backward."""
  h = _elu(_dense(w0, b0, x_bf, interpret))
  y = _dense(w1, b1, h.astype(jnp.bfloat16), interpret)
  if final_act:
    y = _elu(y)
  return h, y


class _RefAccum:
  """List-like adapter that accumulates weight grads straight into their
  VMEM output refs.

  Accumulating through plain jnp values across an unrolled per-view loop
  leaves the adds with no memory dependency, so Mosaic keeps every view's
  d_W matmul results live on the kernel stack at once (V=14 puts the
  static trunk kernel 6.5 MB over the 16 MB scoped-vmem limit even at a
  128-lane tile).  Routing each `dws[i] += g` through the ref serializes
  the accumulation, so only one view's temporaries peak at a time."""

  def __init__(self, refs):
    self.refs = list(refs)

  def __getitem__(self, i):
    if isinstance(i, slice):
      return _RefAccum(self.refs[i])
    return self.refs[i][...]

  def __setitem__(self, i, val):
    self.refs[i][...] = val


def _seq_token(ref):
  """A provably-zero (1,1) value data-dependent on `ref`'s current
  contents.

  Adding it to the next view's recompute input creates a read-after-write
  edge from that view's forward onto this view's weight-grad ref writes,
  stopping Mosaic from hoisting every view's trunk recompute to the top
  of the kernel (which keeps all V views' activations live on the stack
  at once).  min(|x|, 0) == 0 for all finite x, and is not constant-
  foldable because x is a runtime load."""
  return jnp.minimum(jnp.abs(ref[0:1, 0:1]), 0.0)


def _seq_add(x, tok):
  """x + tok, staging the (1,1)->x.shape broadcast one axis at a time
  (Mosaic cannot broadcast in sublanes and lanes in a single op)."""
  row = tok.astype(x.dtype) + jnp.zeros((1, x.shape[-1]), x.dtype)
  return x + row


def _mlp2_bwd(ws4, x_bf, h, y, dy, dws4, interpret, final_act):
  """Backward of _mlp2 given stored post-activations; accumulates the four
  weight grads into dws4 (in place; a List of values or a _RefAccum over
  the grad out-refs), returns dx [I,N] f32."""
  w0, b0, w1, b1 = ws4
  del b0, b1
  if final_act:
    dy = dy * _elu_from_post(y)
  dws4[2] += _dW(dy, h.astype(jnp.bfloat16), interpret)
  dws4[3] += _db(dy)
  dh = _dx(w1, dy, interpret) * _elu_from_post(h)
  dws4[0] += _dW(dh, x_bf, interpret)
  dws4[1] += _db(dh)
  return _dx(w0, dh, interpret)


def dynamic_bwd_kernel(pp_ref, dirfeat_ref, dirpe_ref, posenc_ref, pv_ref,
                       cot_ref, *refs, n_views: int, feat_ch: int,
                       s_block: int, interpret: bool):
  """One grid step: recompute the forward for this tile, then transpose.

  refs: 36 weight refs | 36 weight-grad out refs | d_pv, d_pp, d_dirfeat,
  d_dirpe out refs | scratch x_s [V,128,n] bf16, vis_s [V,8,n] f32.
  """
  ws = refs[:36]
  gws = refs[36:72]
  dpv_ref, dpp_ref, ddirfeat_ref, ddirpe_ref = refs[72:76]
  x_s, vis_s = refs[76:]
  n = pv_ref.shape[2]
  f = feat_ch
  cf = f + 3

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for g in gws:
      g[...] = jnp.zeros_like(g)

  dws = [jnp.zeros(g.shape, jnp.float32) for g in gws]

  # ======================= PHASE A: forward recompute ====================
  msum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    m = pv_ref[vi, 3 + f:4 + f, :].astype(jnp.float32)
    vis_s[vi, 1:2, :] = m
    msum = msum + m
  minv = 1.0 / (msum + 1e-8)

  def rf(vi):  # [Cf,N] bf16
    return pv_ref[vi, 0:3 + f, :] + dirfeat_ref[...]

  def w_of(vi):
    return vis_s[vi, 1:2, :] * minv

  mean = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    mean = mean + w_of(vi) * rf(vi).astype(jnp.float32)
  var = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    var = var + w_of(vi) * (rf(vi).astype(jnp.float32) - mean) ** 2
  gfeat0 = jnp.concatenate([mean, var], axis=0).astype(jnp.bfloat16)

  vsum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    xin = jnp.concatenate([gfeat0, rf(vi)], axis=0)
    _, x0 = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], xin, interpret, True)
    xw = (x0 * w_of(vi)).astype(jnp.bfloat16)
    _, t = _mlp2_fwd_keep(ws[4], ws[5], ws[6], ws[7], xw, interpret, True)
    x = x0 + t[:128, :]
    vis0 = _sigmoid(t[128:129, :]) * vis_s[vi, 1:2, :]
    xv = (x * vis0).astype(jnp.bfloat16)
    _, vh = _mlp2_fwd_keep(ws[8], ws[9], ws[10], ws[11], xv, interpret,
                           False)
    vis = _sigmoid(vh) * vis_s[vi, 1:2, :]
    x_s[vi] = x.astype(jnp.bfloat16)
    vis_s[vi, 0:1, :] = vis
    vsum = vsum + vis

  inv = 1.0 / (vsum + 1e-8)
  mean2 = jnp.zeros((128, n), jnp.float32)
  wsum2 = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    w2 = vis_s[vi, 0:1, :] * inv
    mean2 = mean2 + w2 * x_s[vi].astype(jnp.float32)
    wsum2 = wsum2 + w2
  var2 = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    var2 = var2 + (vis_s[vi, 0:1, :] * inv) * (
        x_s[vi].astype(jnp.float32) - mean2) ** 2
  gin = jnp.concatenate(
      [mean2, var2, wsum2 * (1.0 / n_views)], axis=0).astype(jnp.bfloat16)
  g_h, gf0 = _mlp2_fwd_keep(ws[12], ws[13], ws[14], ws[15], gin, interpret,
                            True)

  gf1 = gf0 + posenc_ref[...]
  gf1_bf = gf1.astype(jnp.bfloat16)

  # ---- attention forward (q,k,v kept; probabilities recomputed in B) ----
  wq, wk, wv, wfc, ln_s, ln_b = ws[16:22]
  q = _dense(wq, None, gf1_bf, interpret).astype(jnp.bfloat16)
  k = _dense(wk, None, gf1_bf, interpret).astype(jnp.bfloat16)
  v = _dense(wv, None, gf1_bf, interpret).astype(jnp.bfloat16)
  blk_q = lax.broadcasted_iota(jnp.int32, (n, n), 0) // s_block
  blk_k = lax.broadcasted_iota(jnp.int32, (n, n), 1) // s_block
  same_ray = blk_q == blk_k
  qmask_row = (msum <= 1.0).astype(jnp.float32)
  qmask_col = lax.dot_general(
      qmask_row, jnp.ones((1, 1), jnp.float32), (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  def head_p(h):
    qh = _mmdt(q[32 * h:32 * h + 32, :], interpret)
    kh = _mmdt(k[32 * h:32 * h + 32, :], interpret)
    logits = lax.dot_general(
        qh, kh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / np.sqrt(32.0))
    logits = logits + qmask_col * -1e9
    logits = jnp.where(same_ray, logits, -2e9)
    return jax.nn.softmax(logits, axis=1)

  o_parts = []
  for h in range(4):
    p = _mmdt(head_p(h), interpret)
    vh_ = _mmdt(v[32 * h:32 * h + 32, :], interpret)
    o_parts.append(lax.dot_general(
        vh_, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
  o = jnp.concatenate(o_parts, axis=0).astype(jnp.bfloat16)
  o2 = _dense(wfc, None, o, interpret)
  o3 = o2 + gf1_bf.astype(jnp.float32)
  mu = jnp.mean(o3, axis=0, keepdims=True)
  lvar = jnp.mean((o3 - mu) ** 2, axis=0, keepdims=True)
  rstd = lax.rsqrt(lvar + 1e-6)
  yhat = (o3 - mu) * rstd
  gf_attn = yhat * ln_s[...] + ln_b[...]

  pts_pe = _pe_rows(pp_ref[0:3, :], _GEO_FREQS).astype(jnp.bfloat16)
  rp_in = jnp.concatenate([gf_attn.astype(jnp.bfloat16), pts_pe], axis=0)
  r_h, gf2 = _mlp2_fwd_keep(ws[22], ws[23], ws[24], ws[25], rp_in,
                            interpret, True)
  gf2_bf = gf2.astype(jnp.bfloat16)

  s_h, _ = _mlp2_fwd_keep(ws[26], ws[27], ws[28], ws[29], gf2_bf,
                          interpret, False)

  h_in = jnp.concatenate([gf2_bf, dirpe_ref[...]], axis=0)
  h1 = _elu(_dense(ws[30], ws[31], h_in, interpret))
  h1_bf = h1.astype(jnp.bfloat16)
  h2 = _elu(_dense(ws[32], ws[33], h1_bf, interpret))
  h2_bf = h2.astype(jnp.bfloat16)
  rgb = _sigmoid(_dense(ws[34], ws[35], h2_bf, interpret))

  # ========================= PHASE B: transpose ==========================
  d_rgb = cot_ref[0:3, :].astype(jnp.float32) * (msum > 0.0)
  d_sigma = cot_ref[3:4, :].astype(jnp.float32) * (msum >= 1.0)

  # rgb head: sigmoid o dense o elu-dense o elu-dense
  d_pre3 = d_rgb * rgb * (1.0 - rgb)
  dws[34] += _dW(d_pre3, h2_bf, interpret)
  dws[35] += _db(d_pre3)
  d_h2 = _dx(ws[34], d_pre3, interpret) * _elu_from_post(h2)
  dws[32] += _dW(d_h2, h1_bf, interpret)
  dws[33] += _db(d_h2)
  d_h1 = _dx(ws[32], d_h2, interpret) * _elu_from_post(h1)
  dws[30] += _dW(d_h1, h_in, interpret)
  dws[31] += _db(d_h1)
  d_hin = _dx(ws[30], d_h1, interpret)
  d_gf2 = d_hin[:128, :]
  ddirpe_ref[...] = d_hin[128:, :]

  # sigma head (mlp2, no final act; the -shift is additive -> no grad)
  dsig = [dws[26], dws[27], dws[28], dws[29]]
  d_gf2 = d_gf2 + _mlp2_bwd(ws[26:30], gf2_bf, s_h, None, d_sigma, dsig,
                            interpret, False)
  dws[26], dws[27], dws[28], dws[29] = dsig

  # ref_pts_fc
  drp = [dws[22], dws[23], dws[24], dws[25]]
  d_rp_in = _mlp2_bwd(ws[22:26], rp_in, r_h, gf2, d_gf2, drp, interpret,
                      True)
  dws[22], dws[23], dws[24], dws[25] = drp
  d_gf_attn = d_rp_in[:128, :]
  d_pts_pe = d_rp_in[128:, :]

  # pts positional-encoding backward -> d_pp
  x3 = pp_ref[0:3, :]
  d_x3 = d_pts_pe[0:3, :]
  nfr = len(_GEO_FREQS)
  for fi, fr in enumerate(_GEO_FREQS):
    d_cos = d_pts_pe[3 * (1 + fi):3 * (2 + fi), :]
    d_sin = d_pts_pe[3 * (1 + nfr + fi):3 * (2 + nfr + fi), :]
    d_x3 = d_x3 + fr * (d_sin * jnp.cos(fr * x3)
                        - d_cos * jnp.sin(fr * x3))
  dpp_ref[...] = d_x3

  # LayerNorm backward (channel axis); ln scale/bias grads sum over lanes
  dws[20] += _db(d_gf_attn * yhat)
  dws[21] += _db(d_gf_attn)
  d_yhat = d_gf_attn * ln_s[...]
  d_o3 = rstd * (d_yhat
                 - jnp.mean(d_yhat, axis=0, keepdims=True)
                 - yhat * jnp.mean(d_yhat * yhat, axis=0, keepdims=True))

  d_gf1 = d_o3                               # residual branch
  dws[19] += _dW(d_o3, o, interpret)
  d_o = _dx(wfc, d_o3, interpret)

  d_q_parts, d_k_parts, d_v_parts = [], [], []
  for h in range(4):
    sl = slice(32 * h, 32 * h + 32)
    d_oh = d_o[sl, :]
    p = head_p(h)
    # o[c,q] = sum_k v[c,k] p[q,k]
    d_v_parts.append(lax.dot_general(
        _mmdt(d_oh, interpret), _mmdt(p, interpret),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    d_p = lax.dot_general(
        _mmdt(d_oh, interpret), _mmdt(v[sl, :], interpret),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    d_logits = p * (d_p - jnp.sum(p * d_p, axis=1, keepdims=True))
    d_logits = jnp.where(same_ray, d_logits, 0.0) * (1.0 / np.sqrt(32.0))
    dl = _mmdt(d_logits, interpret)
    # logits[q,k] = sum_c q[c,q] k[c,k]
    d_q_parts.append(lax.dot_general(
        _mmdt(k[sl, :], interpret), dl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_k_parts.append(lax.dot_general(
        _mmdt(q[sl, :], interpret), dl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
  d_q = jnp.concatenate(d_q_parts, axis=0)
  d_k = jnp.concatenate(d_k_parts, axis=0)
  d_v = jnp.concatenate(d_v_parts, axis=0)

  dws[16] += _dW(d_q, gf1_bf, interpret)
  dws[17] += _dW(d_k, gf1_bf, interpret)
  dws[18] += _dW(d_v, gf1_bf, interpret)
  d_gf1 = (d_gf1 + _dx(wq, d_q, interpret) + _dx(wk, d_k, interpret)
           + _dx(wv, d_v, interpret))

  # geometry_fc backward -> d_gin (posenc add: constant, no grad out)
  dg = [dws[12], dws[13], dws[14], dws[15]]
  d_gin = _mlp2_bwd(ws[12:16], gin, g_h, gf0, d_gf1, dg, interpret, True)
  dws[12], dws[13], dws[14], dws[15] = dg
  d_mean2 = d_gin[0:128, :]
  d_var2 = d_gin[128:256, :]
  d_wsum2 = d_gin[256:257, :] * (1.0 / n_views)

  # pooling-2 backward.  All of w2's mask-side factors die upstream; only
  # d_vis (sigmoid output) and d_vsum survive.
  s2 = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    s2 = s2 + (vis_s[vi, 0:1, :] * inv) * (
        x_s[vi].astype(jnp.float32) - mean2)
  d_mean2_eff = d_mean2 - 2.0 * d_var2 * s2

  d_vsum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    xf = x_s[vi].astype(jnp.float32)
    d_w2 = (_cdot(xf, d_mean2_eff)
            + _cdot((xf - mean2) ** 2, d_var2) + d_wsum2)
    d_vsum = d_vsum - inv * inv * vis_s[vi, 0:1, :] * d_w2

  # ---- per-view trunk backward ----
  d_gfeat0 = jnp.zeros((2 * cf, n), jnp.float32)
  d_dirfeat = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    m = vis_s[vi, 1:2, :]
    w_v = m * minv
    xin = jnp.concatenate([gfeat0, rf(vi)], axis=0)
    a_h, x0 = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], xin, interpret,
                             True)
    xw = (x0 * w_v).astype(jnp.bfloat16)
    c_h, t = _mlp2_fwd_keep(ws[4], ws[5], ws[6], ws[7], xw, interpret,
                            True)
    x = x0 + t[:128, :]
    sg0 = _sigmoid(t[128:129, :])
    vis0 = sg0 * m
    xv = (x * vis0).astype(jnp.bfloat16)
    e_h, vh = _mlp2_fwd_keep(ws[8], ws[9], ws[10], ws[11], xv, interpret,
                             False)
    sg = _sigmoid(vh)

    # pooling-2 cotangents for this view.  Pooling-2 consumed the bf16-
    # rounded x (x_s); the xv path below consumes the f32 x — keep both.
    xf = x_s[vi].astype(jnp.float32)
    w2 = vis_s[vi, 0:1, :] * inv
    d_w2 = (_cdot(xf, d_mean2_eff)
            + _cdot((xf - mean2) ** 2, d_var2) + d_wsum2)
    d_x = w2 * d_mean2_eff + 2.0 * w2 * (xf - mean2) * d_var2
    d_vis = inv * d_w2 + d_vsum

    # vis = sigmoid(vh) * m
    d_vh = sg * (1.0 - sg) * m * d_vis
    dv2 = [dws[8], dws[9], dws[10], dws[11]]
    d_xv = _mlp2_bwd(ws[8:12], xv, e_h, vh, d_vh, dv2, interpret, False)
    dws[8], dws[9], dws[10], dws[11] = dv2

    # xv = x * vis0  (f32 x)
    d_x = d_x + vis0 * d_xv
    d_vis0 = _cdot(x, d_xv)
    d_t128 = sg0 * (1.0 - sg0) * m * d_vis0

    # x = x0 + t[:128]
    d_t = jnp.concatenate([d_x, d_t128], axis=0)   # [129,N]
    dv = [dws[4], dws[5], dws[6], dws[7]]
    d_xw = _mlp2_bwd(ws[4:8], xw, c_h, t, d_t, dv, interpret, True)
    dws[4], dws[5], dws[6], dws[7] = dv

    # xw = x0 * w_v   (w_v is mask-only -> its cotangent dies upstream)
    d_x0 = d_x + w_v * d_xw

    db_ = [dws[0], dws[1], dws[2], dws[3]]
    d_xin = _mlp2_bwd(ws[0:4], xin, a_h, x0, d_x0, db_, interpret, True)
    dws[0], dws[1], dws[2], dws[3] = db_

    d_gfeat0 = d_gfeat0 + d_xin[:2 * cf, :]
    # stash the trunk part of d_rf; pooling-1 adds its part below
    dpv_ref[vi, 0:3 + f, :] = d_xin[2 * cf:, :]

  # pooling-1 backward (weights are mask-only; only d_rf survives)
  d_mean_p = d_gfeat0[:cf, :]
  d_var_p = d_gfeat0[cf:, :]
  s0 = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    s0 = s0 + w_of(vi) * (rf(vi).astype(jnp.float32) - mean)
  d_mean_eff = d_mean_p - 2.0 * d_var_p * s0

  for vi in range(n_views):
    rfv = rf(vi).astype(jnp.float32)
    w_v = w_of(vi)
    d_rf1 = w_v * d_mean_eff + 2.0 * w_v * (rfv - mean) * d_var_p
    d_rf_total = dpv_ref[vi, 0:3 + f, :].astype(jnp.float32) + d_rf1
    dpv_ref[vi, 0:3 + f, :] = d_rf_total
    dpv_ref[vi, 3 + f:4 + f, :] = jnp.zeros((1, n), jnp.float32)
    d_dirfeat = d_dirfeat + d_rf_total

  ddirfeat_ref[...] = d_dirfeat

  for g, acc in zip(gws, dws):
    g[...] += acc


# ==========================================================================
# Two-kernel split backward (fused_bwd_impl="pallas_split")
# ==========================================================================
#
# The single-kernel backward above recomputes the WHOLE forward per tile,
# so its peak VMEM overlaps the per-view trunk liveness with the [n, n]
# attention buffers and all 36 weight-grad accumulators — capping the lane
# tile at 256 and losing to the chunked-flax backward end-to-end.
#
# The split version cuts the program at the natural seam — the per-view
# trunk outputs (x [V,128,N] bf16, vis [V,1,N]) that the forward kernel
# already holds in scratch and, in split mode, spills to HBM as residuals
# (~0.5 GB at the training shape; ~1 ms of HBM traffic):
#
#   * RAY kernel: pooling-2 -> geometry_fc -> ray transformer -> heads,
#     recomputed from the residuals (no trunk work), then transposed.
#     Emits d_x / d_vis per view plus the 24 ray-side weight grads.
#   * TRUNK kernel: pooling-1 + per-view trunk recompute + transpose,
#     consuming d_x / d_vis.  Emits the 12 trunk weight grads, d_pv and
#     d_dirfeat.  Only ONE view's activations are ever live.
#
# Each kernel's working set is roughly half the fused one's, so both run
# at 512-lane tiles (vs 256), and the trunk forward is recomputed once
# instead of twice (once per phase) per tile.


def dynamic_bwd_ray_kernel(pp_ref, dirpe_ref, posenc_ref, xres_ref,
                           visres_ref, cot_ref, *refs, n_views: int,
                           s_block: int, interpret: bool):
  """Ray-side backward: pooling-2 through the rgb/sigma heads.

  refs: 24 ray weight refs (geometry_fc 4 | attention 6 | ref_pts_fc 4 |
  out_geometry_fc 4 | rgb_fc 6) | 24 weight-grad out refs | d_x out
  [V,128,n] f32 | d_vis out [V,8,n] f32 (row 0) | d_pp out [3,n] |
  d_dirpe out [27,n].
  """
  ws = refs[:24]
  gws = refs[24:48]
  dx_ref, dvis_ref, dpp_ref, ddirpe_ref = refs[48:52]
  n = cot_ref.shape[1]

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for g in gws:
      g[...] = jnp.zeros_like(g)

  dws = [jnp.zeros(g.shape, jnp.float32) for g in gws]

  # ---- forward recompute: masks / vis sums from residuals ----
  msum = jnp.zeros((1, n), jnp.float32)
  vsum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    msum = msum + visres_ref[vi, 1:2, :]
    vsum = vsum + visres_ref[vi, 0:1, :]
  inv = 1.0 / (vsum + 1e-8)

  # pooling-2 over the trunk outputs x (bf16 residuals, like the forward)
  mean2 = jnp.zeros((128, n), jnp.float32)
  wsum2 = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    w2 = visres_ref[vi, 0:1, :] * inv
    mean2 = mean2 + w2 * xres_ref[vi].astype(jnp.float32)
    wsum2 = wsum2 + w2
  var2 = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    var2 = var2 + (visres_ref[vi, 0:1, :] * inv) * (
        xres_ref[vi].astype(jnp.float32) - mean2) ** 2
  gin = jnp.concatenate(
      [mean2, var2, wsum2 * (1.0 / n_views)], axis=0).astype(jnp.bfloat16)
  g_h, gf0 = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], gin, interpret,
                            True)

  gf1 = gf0 + posenc_ref[...]
  gf1_bf = gf1.astype(jnp.bfloat16)

  # ---- attention forward (q,k,v kept; probabilities recomputed) ----
  wq, wk, wv, wfc, ln_s, ln_b = ws[4:10]
  q = _dense(wq, None, gf1_bf, interpret).astype(jnp.bfloat16)
  k = _dense(wk, None, gf1_bf, interpret).astype(jnp.bfloat16)
  v = _dense(wv, None, gf1_bf, interpret).astype(jnp.bfloat16)
  blk_q = lax.broadcasted_iota(jnp.int32, (n, n), 0) // s_block
  blk_k = lax.broadcasted_iota(jnp.int32, (n, n), 1) // s_block
  same_ray = blk_q == blk_k
  qmask_row = (msum <= 1.0).astype(jnp.float32)
  qmask_col = lax.dot_general(
      qmask_row, jnp.ones((1, 1), jnp.float32), (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  def head_p(h):
    qh = _mmdt(q[32 * h:32 * h + 32, :], interpret)
    kh = _mmdt(k[32 * h:32 * h + 32, :], interpret)
    logits = lax.dot_general(
        qh, kh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / np.sqrt(32.0))
    logits = jnp.where(qmask_col > 0.5, -1e9, logits)
    logits = jnp.where(same_ray, logits, -2e9)
    return jax.nn.softmax(logits, axis=1)

  o_parts = []
  for h in range(4):
    p = _mmdt(head_p(h), interpret)
    vh_ = _mmdt(v[32 * h:32 * h + 32, :], interpret)
    o_parts.append(lax.dot_general(
        vh_, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
  o = jnp.concatenate(o_parts, axis=0).astype(jnp.bfloat16)
  o2 = _dense(wfc, None, o, interpret)
  o3 = o2 + gf1_bf.astype(jnp.float32)
  mu = jnp.mean(o3, axis=0, keepdims=True)
  lvar = jnp.mean((o3 - mu) ** 2, axis=0, keepdims=True)
  rstd = lax.rsqrt(lvar + 1e-6)
  yhat = (o3 - mu) * rstd
  gf_attn = yhat * ln_s[...] + ln_b[...]

  pts_pe = _pe_rows(pp_ref[0:3, :], _GEO_FREQS).astype(jnp.bfloat16)
  rp_in = jnp.concatenate([gf_attn.astype(jnp.bfloat16), pts_pe], axis=0)
  r_h, gf2 = _mlp2_fwd_keep(ws[10], ws[11], ws[12], ws[13], rp_in,
                            interpret, True)
  gf2_bf = gf2.astype(jnp.bfloat16)

  s_h, _ = _mlp2_fwd_keep(ws[14], ws[15], ws[16], ws[17], gf2_bf,
                          interpret, False)

  h_in = jnp.concatenate([gf2_bf, dirpe_ref[...]], axis=0)
  h1 = _elu(_dense(ws[18], ws[19], h_in, interpret))
  h1_bf = h1.astype(jnp.bfloat16)
  h2 = _elu(_dense(ws[20], ws[21], h1_bf, interpret))
  h2_bf = h2.astype(jnp.bfloat16)
  rgb = _sigmoid(_dense(ws[22], ws[23], h2_bf, interpret))

  # ---- transpose ----
  d_rgb = cot_ref[0:3, :].astype(jnp.float32) * (msum > 0.0)
  d_sigma = cot_ref[3:4, :].astype(jnp.float32) * (msum >= 1.0)

  d_pre3 = d_rgb * rgb * (1.0 - rgb)
  dws[22] += _dW(d_pre3, h2_bf, interpret)
  dws[23] += _db(d_pre3)
  d_h2 = _dx(ws[22], d_pre3, interpret) * _elu_from_post(h2)
  dws[20] += _dW(d_h2, h1_bf, interpret)
  dws[21] += _db(d_h2)
  d_h1 = _dx(ws[20], d_h2, interpret) * _elu_from_post(h1)
  dws[18] += _dW(d_h1, h_in, interpret)
  dws[19] += _db(d_h1)
  d_hin = _dx(ws[18], d_h1, interpret)
  d_gf2 = d_hin[:128, :]
  ddirpe_ref[...] = d_hin[128:, :]

  dsig = [dws[14], dws[15], dws[16], dws[17]]
  d_gf2 = d_gf2 + _mlp2_bwd(ws[14:18], gf2_bf, s_h, None, d_sigma, dsig,
                            interpret, False)
  dws[14], dws[15], dws[16], dws[17] = dsig

  drp = [dws[10], dws[11], dws[12], dws[13]]
  d_rp_in = _mlp2_bwd(ws[10:14], rp_in, r_h, gf2, d_gf2, drp, interpret,
                      True)
  dws[10], dws[11], dws[12], dws[13] = drp
  d_gf_attn = d_rp_in[:128, :]
  d_pts_pe = d_rp_in[128:, :]

  x3 = pp_ref[0:3, :]
  d_x3 = d_pts_pe[0:3, :]
  nfr = len(_GEO_FREQS)
  for fi, fr in enumerate(_GEO_FREQS):
    d_cos = d_pts_pe[3 * (1 + fi):3 * (2 + fi), :]
    d_sin = d_pts_pe[3 * (1 + nfr + fi):3 * (2 + nfr + fi), :]
    d_x3 = d_x3 + fr * (d_sin * jnp.cos(fr * x3)
                        - d_cos * jnp.sin(fr * x3))
  dpp_ref[...] = d_x3

  dws[8] += _db(d_gf_attn * yhat)
  dws[9] += _db(d_gf_attn)
  d_yhat = d_gf_attn * ln_s[...]
  d_o3 = rstd * (d_yhat
                 - jnp.mean(d_yhat, axis=0, keepdims=True)
                 - yhat * jnp.mean(d_yhat * yhat, axis=0, keepdims=True))

  d_gf1 = d_o3
  dws[7] += _dW(d_o3, o, interpret)
  d_o = _dx(wfc, d_o3, interpret)

  d_q_parts, d_k_parts, d_v_parts = [], [], []
  for h in range(4):
    sl = slice(32 * h, 32 * h + 32)
    d_oh = d_o[sl, :]
    p = head_p(h)
    d_v_parts.append(lax.dot_general(
        _mmdt(d_oh, interpret), _mmdt(p, interpret),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    d_p = lax.dot_general(
        _mmdt(d_oh, interpret), _mmdt(v[sl, :], interpret),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    d_logits = p * (d_p - jnp.sum(p * d_p, axis=1, keepdims=True))
    d_logits = jnp.where(same_ray, d_logits, 0.0) * (1.0 / np.sqrt(32.0))
    dl = _mmdt(d_logits, interpret)
    d_q_parts.append(lax.dot_general(
        _mmdt(k[sl, :], interpret), dl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_k_parts.append(lax.dot_general(
        _mmdt(q[sl, :], interpret), dl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
  d_q = jnp.concatenate(d_q_parts, axis=0)
  d_k = jnp.concatenate(d_k_parts, axis=0)
  d_v = jnp.concatenate(d_v_parts, axis=0)

  dws[4] += _dW(d_q, gf1_bf, interpret)
  dws[5] += _dW(d_k, gf1_bf, interpret)
  dws[6] += _dW(d_v, gf1_bf, interpret)
  d_gf1 = (d_gf1 + _dx(wq, d_q, interpret) + _dx(wk, d_k, interpret)
           + _dx(wv, d_v, interpret))

  dg = [dws[0], dws[1], dws[2], dws[3]]
  d_gin = _mlp2_bwd(ws[0:4], gin, g_h, gf0, d_gf1, dg, interpret, True)
  dws[0], dws[1], dws[2], dws[3] = dg
  d_mean2 = d_gin[0:128, :]
  d_var2 = d_gin[128:256, :]
  d_wsum2 = d_gin[256:257, :] * (1.0 / n_views)

  # ---- pooling-2 backward -> per-view d_x, d_vis ----
  s2 = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    s2 = s2 + (visres_ref[vi, 0:1, :] * inv) * (
        xres_ref[vi].astype(jnp.float32) - mean2)
  d_mean2_eff = d_mean2 - 2.0 * d_var2 * s2

  d_vsum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    xf = xres_ref[vi].astype(jnp.float32)
    d_w2 = (_cdot(xf, d_mean2_eff)
            + _cdot((xf - mean2) ** 2, d_var2) + d_wsum2)
    d_vsum = d_vsum - inv * inv * visres_ref[vi, 0:1, :] * d_w2

  for vi in range(n_views):
    xf = xres_ref[vi].astype(jnp.float32)
    w2 = visres_ref[vi, 0:1, :] * inv
    d_w2 = (_cdot(xf, d_mean2_eff)
            + _cdot((xf - mean2) ** 2, d_var2) + d_wsum2)
    dx_ref[vi] = (w2 * d_mean2_eff
                  + 2.0 * w2 * (xf - mean2) * d_var2).astype(dx_ref.dtype)
    dvis_ref[vi, 0:1, :] = inv * d_w2 + d_vsum
    dvis_ref[vi, 1:8, :] = jnp.zeros((7, n), jnp.float32)

  for g, acc in zip(gws, dws):
    g[...] += acc


def dynamic_bwd_trunk_kernel(dirfeat_ref, pv_ref, dx_ref, dvis_ref, *refs,
                             n_views: int, feat_ch: int, interpret: bool):
  """Trunk-side backward: pooling-1 + per-view trunk, one view live at a
  time.

  refs: 12 trunk weight refs (base_fc 4 | vis_fc 4 | vis_fc2 4) | 12
  weight-grad out refs | d_pv out [V,f+4,n] f32 | d_dirfeat out [cf,n]
  f32 | scratch d_rf stash [V,cf,n] f32.
  """
  ws = refs[:12]
  gws = refs[12:24]
  dpv_ref, ddirfeat_ref = refs[24:26]
  drf_s = refs[26]
  n = pv_ref.shape[2]
  f = feat_ch
  cf = f + 3

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for g in gws:
      g[...] = jnp.zeros_like(g)

  dws = _RefAccum(gws)

  # ---- pooling-1 forward recompute ----
  msum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    msum = msum + pv_ref[vi, 3 + f:4 + f, :].astype(jnp.float32)
  minv = 1.0 / (msum + 1e-8)

  def rf(vi):  # [Cf,N] bf16
    return pv_ref[vi, 0:3 + f, :] + dirfeat_ref[...]

  def m_of(vi):
    return pv_ref[vi, 3 + f:4 + f, :].astype(jnp.float32)

  def w_of(vi):
    return m_of(vi) * minv

  mean = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    mean = mean + w_of(vi) * rf(vi).astype(jnp.float32)
  var = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    var = var + w_of(vi) * (rf(vi).astype(jnp.float32) - mean) ** 2
  gfeat0 = jnp.concatenate([mean, var], axis=0).astype(jnp.bfloat16)

  # ---- per-view trunk recompute + transpose (one view live) ----
  d_gfeat0 = jnp.zeros((2 * cf, n), jnp.float32)
  for vi in range(n_views):
    m = m_of(vi)
    w_v = m * minv
    xin = jnp.concatenate([gfeat0, rf(vi)], axis=0)
    a_h, x0 = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], xin, interpret,
                             True)
    xw = (x0 * w_v).astype(jnp.bfloat16)
    c_h, t = _mlp2_fwd_keep(ws[4], ws[5], ws[6], ws[7], xw, interpret,
                            True)
    x = x0 + t[:128, :]
    sg0 = _sigmoid(t[128:129, :])
    vis0 = sg0 * m
    xv = (x * vis0).astype(jnp.bfloat16)
    e_h, vh = _mlp2_fwd_keep(ws[8], ws[9], ws[10], ws[11], xv, interpret,
                             False)
    sg = _sigmoid(vh)

    d_x = dx_ref[vi][...].astype(jnp.float32)
    d_vis = dvis_ref[vi, 0:1, :]

    # vis = sigmoid(vh) * m
    d_vh = sg * (1.0 - sg) * m * d_vis
    d_xv = _mlp2_bwd(ws[8:12], xv, e_h, vh, d_vh, dws[8:12], interpret,
                     False)

    # xv = x * vis0  (f32 x)
    d_x = d_x + vis0 * d_xv
    d_vis0 = _cdot(x, d_xv)
    d_t128 = sg0 * (1.0 - sg0) * m * d_vis0

    # x = x0 + t[:128]
    d_t = jnp.concatenate([d_x, d_t128], axis=0)   # [129,N]
    d_xw = _mlp2_bwd(ws[4:8], xw, c_h, t, d_t, dws[4:8], interpret, True)

    # xw = x0 * w_v   (w_v is mask-only -> its cotangent dies upstream)
    d_x0 = d_x + w_v * d_xw

    d_xin = _mlp2_bwd(ws[0:4], xin, a_h, x0, d_x0, dws[0:4], interpret,
                      True)

    d_gfeat0 = d_gfeat0 + d_xin[:2 * cf, :]
    drf_s[vi] = d_xin[2 * cf:, :]

  # ---- pooling-1 backward ----
  d_mean_p = d_gfeat0[:cf, :]
  d_var_p = d_gfeat0[cf:, :]
  s0 = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    s0 = s0 + w_of(vi) * (rf(vi).astype(jnp.float32) - mean)
  d_mean_eff = d_mean_p - 2.0 * d_var_p * s0

  d_dirfeat = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    rfv = rf(vi).astype(jnp.float32)
    w_v = w_of(vi)
    d_rf1 = w_v * d_mean_eff + 2.0 * w_v * (rfv - mean) * d_var_p
    d_rf_total = drf_s[vi][...] + d_rf1
    dpv_ref[vi, 0:3 + f, :] = d_rf_total
    dpv_ref[vi, 3 + f:4 + f, :] = jnp.zeros((1, n), jnp.float32)
    d_dirfeat = d_dirfeat + d_rf_total

  ddirfeat_ref[...] = d_dirfeat


def _pe_bwd(d_pe: jnp.ndarray, x: jnp.ndarray, freqs) -> jnp.ndarray:
  """Backward of _pe_rows: d_pe [C*(2F+1),N] f32, x [C,N] f32 -> [C,N]."""
  c = x.shape[0]
  nf = len(freqs)
  d = d_pe[0:c, :]
  for fi, fr in enumerate(freqs):
    d_cos = d_pe[c * (1 + fi):c * (2 + fi), :]
    d_sin = d_pe[c * (1 + nf + fi):c * (2 + nf + fi), :]
    d = d + fr * (d_sin * jnp.cos(fr * x) - d_cos * jnp.sin(fr * x))
  return d


# ==========================================================================
# Static aggregator split backward (fused_bwd_impl="pallas_split")
# ==========================================================================
#
# Same ray/trunk seam as the dynamic split, with three static-specific
# extensions (mirroring pallas_agg._static_kernel):
#   * the rgb head is a per-view BLENDING head (softmax over view logits,
#     reference mlp_network.py:509-520) — it consumes the trunk residuals
#     x/vis plus the ray-level global feature, so its backward lives in the
#     RAY kernel and its d_x/d_vis merge with the pooling-2 cotangents;
#   * the per-view input MLP (ray_dir_fc) backward lives in the TRUNK
#     kernel, chaining to the source-Plucker positional encoding (d_srcpl),
#     the reference-ray feature (d_reffeat) and the pts PE (d_pp);
#   * anti-alias pooling weights are exp(|s|(dot-1))-based and DIFFERENTIABLE
#     (unlike the mask-only dynamic weights): the weight cotangents from
#     pooling-1 and the x*w trunk input survive into d_dot (a ray_diff row),
#     and d_s (the learned sharpness scalar, emitted as a per-lane vector
#     the host sums).  The min-over-views subgradient splits equally among
#     ties, matching jnp.min's vjp.


def static_bwd_ray_kernel(pv_ref, xres_ref, visres_ref, cot_ref, *refs,
                          n_views: int, feat_ch: int, s_block: int,
                          interpret: bool):
  """Ray-side static backward: pooling-2 -> geometry_fc -> attention ->
  sigma head + per-view blending rgb head.

  refs: 20 ray weight refs (geometry_fc 4 | attention 6 | sigma 4 |
  rgb_fc 6) | 20 weight-grad out refs | d_x out [V,128,n] bf16 | d_misc
  out [V,8,n] f32 (row 0 d_vis, rows 1:4 d_rgb, rows 4:8 d_ray_diff).
  """
  ws = refs[:20]
  gws = refs[20:40]
  dx_ref, dmisc_ref = refs[40:42]
  n = cot_ref.shape[1]
  f = feat_ch

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for g in gws:
      g[...] = jnp.zeros_like(g)

  dws = [jnp.zeros(g.shape, jnp.float32) for g in gws]

  msum = jnp.zeros((1, n), jnp.float32)
  vsum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    msum = msum + visres_ref[vi, 1:2, :]
    vsum = vsum + visres_ref[vi, 0:1, :]
  inv = 1.0 / (vsum + 1e-8)

  # ---- pooling-2 + geometry_fc recompute ----
  mean2 = jnp.zeros((128, n), jnp.float32)
  wsum2 = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    w2 = visres_ref[vi, 0:1, :] * inv
    mean2 = mean2 + w2 * xres_ref[vi].astype(jnp.float32)
    wsum2 = wsum2 + w2
  var2 = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    var2 = var2 + (visres_ref[vi, 0:1, :] * inv) * (
        xres_ref[vi].astype(jnp.float32) - mean2) ** 2
  gin = jnp.concatenate(
      [mean2, var2, wsum2 * (1.0 / n_views)], axis=0).astype(jnp.bfloat16)
  g_h, gf0 = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], gin, interpret,
                            True)
  gf1_bf = gf0.astype(jnp.bfloat16)          # static: no posenc add

  # ---- attention forward ----
  wq, wk, wv, wfc, ln_s, ln_b = ws[4:10]
  q = _dense(wq, None, gf1_bf, interpret).astype(jnp.bfloat16)
  k = _dense(wk, None, gf1_bf, interpret).astype(jnp.bfloat16)
  v = _dense(wv, None, gf1_bf, interpret).astype(jnp.bfloat16)
  blk_q = lax.broadcasted_iota(jnp.int32, (n, n), 0) // s_block
  blk_k = lax.broadcasted_iota(jnp.int32, (n, n), 1) // s_block
  same_ray = blk_q == blk_k
  qmask_row = (msum <= 1.0).astype(jnp.float32)
  qmask_col = lax.dot_general(
      qmask_row, jnp.ones((1, 1), jnp.float32), (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  def head_p(h):
    qh = _mmdt(q[32 * h:32 * h + 32, :], interpret)
    kh = _mmdt(k[32 * h:32 * h + 32, :], interpret)
    logits = lax.dot_general(
        qh, kh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / np.sqrt(32.0))
    logits = jnp.where(qmask_col > 0.5, -1e9, logits)
    logits = jnp.where(same_ray, logits, -2e9)
    return jax.nn.softmax(logits, axis=1)

  o_parts = []
  for h in range(4):
    p = _mmdt(head_p(h), interpret)
    vh_ = _mmdt(v[32 * h:32 * h + 32, :], interpret)
    o_parts.append(lax.dot_general(
        vh_, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
  o = jnp.concatenate(o_parts, axis=0).astype(jnp.bfloat16)
  o2 = _dense(wfc, None, o, interpret)
  o3 = o2 + gf1_bf.astype(jnp.float32)
  mu = jnp.mean(o3, axis=0, keepdims=True)
  lvar = jnp.mean((o3 - mu) ** 2, axis=0, keepdims=True)
  rstd = lax.rsqrt(lvar + 1e-6)
  yhat = (o3 - mu) * rstd
  gf_attn = yhat * ln_s[...] + ln_b[...]
  gf_bf = gf_attn.astype(jnp.bfloat16)

  s_h, _ = _mlp2_fwd_keep(ws[10], ws[11], ws[12], ws[13], gf_bf,
                          interpret, False)

  # ---- blending rgb head: logits pass ----
  def head_in(vi):
    return jnp.concatenate(
        [gf_bf, xres_ref[vi][...],
         visres_ref[vi, 0:1, :].astype(jnp.bfloat16),
         pv_ref[vi, 3 + f:7 + f, :]], axis=0)                  # [261,N]

  logits_v = []
  for vi in range(n_views):
    h1 = _elu(_dense(ws[14], ws[15], head_in(vi), interpret))
    h2 = _elu(_dense(ws[16], ws[17], h1.astype(jnp.bfloat16), interpret))
    logit = _dense(ws[18], ws[19], h2.astype(jnp.bfloat16), interpret)
    logit = jnp.where(visres_ref[vi, 1:2, :] == 0.0, -1e9, logit)
    logits_v.append(logit)
  lmax = logits_v[0]
  for vi in range(1, n_views):
    lmax = jnp.maximum(lmax, logits_v[vi])
  b_v = [jnp.exp(lg - lmax) for lg in logits_v]
  bsum = b_v[0]
  for vi in range(1, n_views):
    bsum = bsum + b_v[vi]
  p_v = [b / bsum for b in b_v]

  # ======================= transpose =====================================
  d_rgb = cot_ref[0:3, :].astype(jnp.float32)
  d_sigma = cot_ref[3:4, :].astype(jnp.float32) * (msum >= 1.0)

  # blending softmax over views
  dp_v = [_cdot(pv_ref[vi, 0:3, :].astype(jnp.float32), d_rgb)
          for vi in range(n_views)]
  s_blend = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    s_blend = s_blend + p_v[vi] * dp_v[vi]

  d_gf_attn = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    m = visres_ref[vi, 1:2, :]
    d_logit = p_v[vi] * (dp_v[vi] - s_blend) * (m > 0.0)
    dmisc_ref[vi, 1:4, :] = p_v[vi] * d_rgb                    # d rgb rows
    # head backward (hiddens recomputed)
    h_in = head_in(vi)
    h1 = _elu(_dense(ws[14], ws[15], h_in, interpret))
    h1_bf = h1.astype(jnp.bfloat16)
    h2 = _elu(_dense(ws[16], ws[17], h1_bf, interpret))
    h2_bf = h2.astype(jnp.bfloat16)
    dws[18] += _dW(d_logit, h2_bf, interpret)
    dws[19] += _db(d_logit)
    d_h2 = _dx(ws[18], d_logit, interpret) * _elu_from_post(h2)
    dws[16] += _dW(d_h2, h1_bf, interpret)
    dws[17] += _db(d_h2)
    d_h1 = _dx(ws[16], d_h2, interpret) * _elu_from_post(h1)
    dws[14] += _dW(d_h1, h_in, interpret)
    dws[15] += _db(d_h1)
    d_h = _dx(ws[14], d_h1, interpret)
    d_gf_attn = d_gf_attn + d_h[0:128, :]
    dx_ref[vi] = d_h[128:256, :].astype(dx_ref.dtype)  # head part; pool
    dmisc_ref[vi, 0:1, :] = d_h[256:257, :]            # part added below
    dmisc_ref[vi, 4:8, :] = d_h[257:261, :]

  # sigma head
  dsig = [dws[10], dws[11], dws[12], dws[13]]
  d_gf_attn = d_gf_attn + _mlp2_bwd(ws[10:14], gf_bf, s_h, None, d_sigma,
                                    dsig, interpret, False)
  dws[10], dws[11], dws[12], dws[13] = dsig

  # LayerNorm + attention backward
  dws[8] += _db(d_gf_attn * yhat)
  dws[9] += _db(d_gf_attn)
  d_yhat = d_gf_attn * ln_s[...]
  d_o3 = rstd * (d_yhat
                 - jnp.mean(d_yhat, axis=0, keepdims=True)
                 - yhat * jnp.mean(d_yhat * yhat, axis=0, keepdims=True))
  d_gf1 = d_o3
  dws[7] += _dW(d_o3, o, interpret)
  d_o = _dx(wfc, d_o3, interpret)
  d_q_parts, d_k_parts, d_v_parts = [], [], []
  for h in range(4):
    sl = slice(32 * h, 32 * h + 32)
    d_oh = d_o[sl, :]
    p = head_p(h)
    d_v_parts.append(lax.dot_general(
        _mmdt(d_oh, interpret), _mmdt(p, interpret),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    d_p = lax.dot_general(
        _mmdt(d_oh, interpret), _mmdt(v[sl, :], interpret),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    d_logits = p * (d_p - jnp.sum(p * d_p, axis=1, keepdims=True))
    d_logits = jnp.where(same_ray, d_logits, 0.0) * (1.0 / np.sqrt(32.0))
    dl = _mmdt(d_logits, interpret)
    d_q_parts.append(lax.dot_general(
        _mmdt(k[sl, :], interpret), dl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_k_parts.append(lax.dot_general(
        _mmdt(q[sl, :], interpret), dl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
  d_q = jnp.concatenate(d_q_parts, axis=0)
  d_k = jnp.concatenate(d_k_parts, axis=0)
  d_v = jnp.concatenate(d_v_parts, axis=0)
  dws[4] += _dW(d_q, gf1_bf, interpret)
  dws[5] += _dW(d_k, gf1_bf, interpret)
  dws[6] += _dW(d_v, gf1_bf, interpret)
  d_gf1 = (d_gf1 + _dx(wq, d_q, interpret) + _dx(wk, d_k, interpret)
           + _dx(wv, d_v, interpret))

  # geometry_fc backward -> pooling-2 backward
  dg = [dws[0], dws[1], dws[2], dws[3]]
  d_gin = _mlp2_bwd(ws[0:4], gin, g_h, gf0, d_gf1, dg, interpret, True)
  dws[0], dws[1], dws[2], dws[3] = dg
  d_mean2 = d_gin[0:128, :]
  d_var2 = d_gin[128:256, :]
  d_wsum2 = d_gin[256:257, :] * (1.0 / n_views)

  s2 = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    s2 = s2 + (visres_ref[vi, 0:1, :] * inv) * (
        xres_ref[vi].astype(jnp.float32) - mean2)
  d_mean2_eff = d_mean2 - 2.0 * d_var2 * s2

  d_vsum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    xf = xres_ref[vi].astype(jnp.float32)
    d_w2 = (_cdot(xf, d_mean2_eff)
            + _cdot((xf - mean2) ** 2, d_var2) + d_wsum2)
    d_vsum = d_vsum - inv * inv * visres_ref[vi, 0:1, :] * d_w2

  for vi in range(n_views):
    xf = xres_ref[vi].astype(jnp.float32)
    w2 = visres_ref[vi, 0:1, :] * inv
    d_w2 = (_cdot(xf, d_mean2_eff)
            + _cdot((xf - mean2) ** 2, d_var2) + d_wsum2)
    d_x_pool = w2 * d_mean2_eff + 2.0 * w2 * (xf - mean2) * d_var2
    dx_ref[vi] = (dx_ref[vi][...].astype(jnp.float32)
                  + d_x_pool).astype(dx_ref.dtype)
    dmisc_ref[vi, 0:1, :] = (dmisc_ref[vi, 0:1, :]
                             + inv * d_w2 + d_vsum)

  for g, acc in zip(gws, dws):
    g[...] += acc


def static_bwd_trunk_kernel(pp_ref, reffeat_ref, pv_ref, srcpl_ref, s_ref,
                            rfres_ref, dx_ref, dmisc_ref, *refs,
                            n_views: int, feat_ch: int, anti_alias: bool,
                            mask_rgb: bool, interpret: bool):
  """Trunk-side static backward: per-view input MLP + pooling-1 + trunk,
  one view live at a time; AA weight chain -> d_dot / d_s.

  refs: 16 trunk weight refs (ray_dir_fc 4 | base_fc 4 | vis_fc 4 |
  vis_fc2 4) | 16 weight-grad out refs | d_pv out [V,f+8,n] f32 |
  d_reffeat out [f+3,n] f32 | d_pp out [3,n] f32 | d_srcpl out [V,6,n]
  f32 | d_s out [1,n] f32 (per-lane, host sums) | scratch d_rf stash
  [V,2f+6,n] f32.
  """
  ws = refs[:16]
  gws = refs[16:32]
  dpv_ref, dreffeat_ref, dpp_ref, dsrcpl_ref, ds_ref = refs[32:37]
  drf_s = refs[37]
  n = pv_ref.shape[2]
  f = feat_ch
  cfs = 2 * f + 6

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for g in gws:
      g[...] = jnp.zeros_like(g)

  dws = _RefAccum(gws)

  # ---- masks and pooling weights ----
  m_v = []
  for vi in range(n_views):
    m = pv_ref[vi, 7 + f:8 + f, :].astype(jnp.float32)
    if mask_rgb:
      rgb_sum = jnp.sum(pv_ref[vi, 0:3, :].astype(jnp.float32), axis=0,
                        keepdims=True)
      m = m * (rgb_sum > 1e-3).astype(jnp.float32)
    m_v.append(m)

  if anti_alias:
    s_val = s_ref[0, 0]
    s_abs = jnp.abs(s_val)
    dot_v = [pv_ref[vi, 6 + f:7 + f, :].astype(jnp.float32)
             for vi in range(n_views)]
    ed_v = [jnp.exp(s_abs * (d - 1.0)) for d in dot_v]
    emin = ed_v[0]
    for vi in range(1, n_views):
      emin = jnp.minimum(emin, ed_v[vi])
    wp_v = [(ed_v[vi] - emin) * m_v[vi] for vi in range(n_views)]
    wsum = jnp.zeros((1, n), jnp.float32)
    for wp in wp_v:
      wsum = wsum + wp
    winv = 1.0 / (wsum + 1e-8)
    w_v = [wp * winv for wp in wp_v]
  else:
    msum = jnp.zeros((1, n), jnp.float32)
    for m in m_v:
      msum = msum + m
    minv = 1.0 / (msum + 1e-8)
    w_v = [m * minv for m in m_v]

  def rf(vi):  # [2f+6,N] bf16 (saved by the forward)
    return rfres_ref[vi][...]

  mean = jnp.zeros((cfs, n), jnp.float32)
  for vi in range(n_views):
    mean = mean + w_v[vi] * rf(vi).astype(jnp.float32)
  var = jnp.zeros((cfs, n), jnp.float32)
  for vi in range(n_views):
    var = var + w_v[vi] * (rf(vi).astype(jnp.float32) - mean) ** 2
  gfeat0 = jnp.concatenate([mean, var], axis=0).astype(jnp.bfloat16)

  # ---- per-view trunk backward (serialized: one view live at a time) ----
  d_gfeat0 = jnp.zeros((2 * cfs, n), jnp.float32)
  d_w = [None] * n_views
  tok = jnp.zeros((1, 1), jnp.float32)
  for vi in range(n_views):
    m = m_v[vi]
    xin = _seq_add(jnp.concatenate([gfeat0, rf(vi)], axis=0), tok)
    a_h, x0 = _mlp2_fwd_keep(ws[4], ws[5], ws[6], ws[7], xin, interpret,
                             True)
    xw = (x0 * w_v[vi]).astype(jnp.bfloat16)
    c_h, t = _mlp2_fwd_keep(ws[8], ws[9], ws[10], ws[11], xw, interpret,
                            True)
    x = x0 + t[:128, :]
    sg0 = _sigmoid(t[128:129, :])
    vis0 = sg0 * m
    xv = (x * vis0).astype(jnp.bfloat16)
    e_h, vh = _mlp2_fwd_keep(ws[12], ws[13], ws[14], ws[15], xv, interpret,
                             False)
    sg = _sigmoid(vh)

    d_x = dx_ref[vi][...].astype(jnp.float32)
    d_vis = dmisc_ref[vi, 0:1, :]

    d_vh = sg * (1.0 - sg) * m * d_vis
    d_xv = _mlp2_bwd(ws[12:16], xv, e_h, vh, d_vh, dws[12:16], interpret,
                     False)

    d_x = d_x + vis0 * d_xv
    d_vis0 = _cdot(x, d_xv)
    d_t128 = sg0 * (1.0 - sg0) * m * d_vis0

    d_t = jnp.concatenate([d_x, d_t128], axis=0)
    d_xw = _mlp2_bwd(ws[8:12], xw, c_h, t, d_t, dws[8:12], interpret, True)

    d_x0 = d_x + w_v[vi] * d_xw
    if anti_alias:
      d_w[vi] = _cdot(x0, d_xw)          # x*w trunk-input weight grad

    d_xin = _mlp2_bwd(ws[4:8], xin, a_h, x0, d_x0, dws[4:8], interpret,
                      True)

    d_gfeat0 = d_gfeat0 + d_xin[:2 * cfs, :]
    # bf16 stash: halves the scratch footprint; rounding is of the same
    # order as the bf16 flax backward's own matmul rounding
    drf_s[vi] = d_xin[2 * cfs:, :].astype(jnp.bfloat16)
    tok = _seq_token(gws[4])

  # ---- pooling-1 backward + input-MLP backward ----
  d_mean_p = d_gfeat0[:cfs, :]
  d_var_p = d_gfeat0[cfs:, :]
  s0 = jnp.zeros((cfs, n), jnp.float32)
  for vi in range(n_views):
    s0 = s0 + w_v[vi] * (rf(vi).astype(jnp.float32) - mean)
  d_mean_eff = d_mean_p - 2.0 * d_var_p * s0

  pts_pe = _pe_rows(pp_ref[0:3, :], _GEO_FREQS)
  pts_pe_bf = pts_pe.astype(jnp.bfloat16)
  reffeat_f = reffeat_ref[...].astype(jnp.float32)
  d_reffeat = jnp.zeros((f + 3, n), jnp.float32)
  d_ptspe = jnp.zeros((pts_pe.shape[0], n), jnp.float32)
  for vi in range(n_views):
    rf_f = rf(vi).astype(jnp.float32)
    d_rf1 = (w_v[vi] * d_mean_eff
             + 2.0 * w_v[vi] * (rf_f - mean) * d_var_p)
    if anti_alias:
      d_w[vi] = (d_w[vi] + _cdot(rf_f, d_mean_eff)
                 + _cdot((rf_f - mean) ** 2, d_var_p))
    d_rf_tot = drf_s[vi][...].astype(jnp.float32) + d_rf1
    d_pvfeat = d_rf_tot[0:f + 3, :]
    d_c = d_rf_tot[f + 3:cfs, :]

    # input MLP (ray_dir_fc) recompute + backward (serialized per view,
    # see _seq_token)
    src_pe = _pe_rows(srcpl_ref[vi, 0:6, :], _GEO_FREQS)
    h_in = _seq_add(jnp.concatenate(
        [pts_pe_bf, src_pe.astype(jnp.bfloat16),
         pv_ref[vi, 3 + f:7 + f, :]], axis=0), tok)            # [103,N]
    hh, sf = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], h_in, interpret,
                            False)
    d_sf = d_c * reffeat_f
    d_reffeat = d_reffeat + d_c * sf
    d_h = _mlp2_bwd(ws[0:4], h_in, hh, sf, d_sf, dws[0:4], interpret,
                    False)

    n_pe = pts_pe.shape[0]                                     # 33
    d_ptspe = d_ptspe + d_h[0:n_pe, :]
    d_srcpe = d_h[n_pe:n_pe + 66, :]
    dsrcpl_ref[vi] = _pe_bwd(d_srcpe, srcpl_ref[vi, 0:6, :], _GEO_FREQS)

    dpv_ref[vi, 0:3, :] = d_pvfeat[0:3, :] + dmisc_ref[vi, 1:4, :]
    dpv_ref[vi, 3:3 + f, :] = d_pvfeat[3:, :]
    dpv_ref[vi, 3 + f:7 + f, :] = (d_h[n_pe + 66:n_pe + 70, :]
                                   + dmisc_ref[vi, 4:8, :])
    dpv_ref[vi, 7 + f:8 + f, :] = jnp.zeros((1, n), jnp.float32)
    tok = _seq_token(gws[0])

  dreffeat_ref[...] = d_reffeat
  dpp_ref[...] = _pe_bwd(d_ptspe, pp_ref[0:3, :], _GEO_FREQS)

  # ---- anti-alias weight chain ----
  if anti_alias:
    sw = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      sw = sw + w_v[vi] * d_w[vi]
    d_wp = [winv * (d_w[vi] - sw) for vi in range(n_views)]
    d_emin = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      d_emin = d_emin - m_v[vi] * d_wp[vi]
    cnt = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      cnt = cnt + (ed_v[vi] == emin).astype(jnp.float32)
    d_s_lane = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      d_ed = (m_v[vi] * d_wp[vi]
              + (ed_v[vi] == emin).astype(jnp.float32) / cnt * d_emin)
      d_dot = d_ed * ed_v[vi] * s_abs
      dpv_ref[vi, 6 + f:7 + f, :] = (dpv_ref[vi, 6 + f:7 + f, :] + d_dot)
      d_s_lane = d_s_lane + d_ed * ed_v[vi] * (dot_v[vi] - 1.0)
    ds_ref[...] = d_s_lane * jnp.sign(s_val)
  else:
    ds_ref[...] = jnp.zeros((1, n), jnp.float32)


# ==========================================================================
# Static aggregator THREE-kernel split backward (pallas_bwd="split3")
# ==========================================================================
#
# The two-kernel static trunk backward above tops out at a 128-lane tile:
# its per-view loop overlaps the 228-wide trunk recompute with the 103->256
# input-MLP (ray_dir_fc) recompute+transpose, the source-Plucker PE chain
# and their weight-grad matmuls, and at V=14 that stack exceeds Mosaic's
# 16 MB scoped-vmem limit beyond 128 lanes.  The split3 variant moves the
# input-MLP phase into its OWN kernel, cut at the d_rf seam (the total
# cotangent of the per-view input feature rf = [pv_feat | sf * reffeat],
# which the trunk kernel already materializes):
#
#   * TRUNK3 kernel: pooling-1 + per-view trunk recompute/transpose + the
#     anti-alias weight chain.  Emits the 12 trunk weight grads, d_rf_tot
#     [V, cfs, n] f32 (HBM residual, ~3 MB/Mpoint), d_dot and d_s.
#   * INPUT-MLP kernel: per-view ray_dir_fc recompute/transpose from
#     d_rf_tot; emits its 4 weight grads, the full d_pv, d_reffeat,
#     d_pp and d_srcpl.
#
# Each kernel's per-view working set shrinks by the other's, which is what
# lets the trunk tile grow past 128 lanes (sweep via
# DYNIBAR_AGG_SPLIT_ST_VLANES once compile-verified on hardware).


def static_bwd_trunk3_kernel(pv_ref, s_ref, rfres_ref, dx_ref, dmisc_ref,
                             *refs, n_views: int, feat_ch: int,
                             anti_alias: bool, mask_rgb: bool,
                             interpret: bool):
  """Trunk-side static backward without the input-MLP phase.

  refs: 12 trunk weight refs (base_fc 4 | vis_fc 4 | vis_fc2 4) | 12
  weight-grad out refs | d_rf_tot out [V,cfs,n] f32 | d_dot out [V,1,n]
  f32 | d_s out [1,n] f32 (per-lane, host sums) | scratch d_rf stash
  [V,cfs,n] bf16.
  """
  ws = refs[:12]
  gws = refs[12:24]
  drftot_ref, ddot_ref, ds_ref = refs[24:27]
  drf_s = refs[27]
  n = pv_ref.shape[2]
  f = feat_ch
  cfs = 2 * f + 6

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for g in gws:
      g[...] = jnp.zeros_like(g)

  dws = _RefAccum(gws)

  # ---- masks and pooling weights (as static_bwd_trunk_kernel) ----
  m_v = []
  for vi in range(n_views):
    m = pv_ref[vi, 7 + f:8 + f, :].astype(jnp.float32)
    if mask_rgb:
      rgb_sum = jnp.sum(pv_ref[vi, 0:3, :].astype(jnp.float32), axis=0,
                        keepdims=True)
      m = m * (rgb_sum > 1e-3).astype(jnp.float32)
    m_v.append(m)

  if anti_alias:
    s_val = s_ref[0, 0]
    s_abs = jnp.abs(s_val)
    dot_v = [pv_ref[vi, 6 + f:7 + f, :].astype(jnp.float32)
             for vi in range(n_views)]
    ed_v = [jnp.exp(s_abs * (d - 1.0)) for d in dot_v]
    emin = ed_v[0]
    for vi in range(1, n_views):
      emin = jnp.minimum(emin, ed_v[vi])
    wp_v = [(ed_v[vi] - emin) * m_v[vi] for vi in range(n_views)]
    wsum = jnp.zeros((1, n), jnp.float32)
    for wp in wp_v:
      wsum = wsum + wp
    winv = 1.0 / (wsum + 1e-8)
    w_v = [wp * winv for wp in wp_v]
  else:
    msum = jnp.zeros((1, n), jnp.float32)
    for m in m_v:
      msum = msum + m
    minv = 1.0 / (msum + 1e-8)
    w_v = [m * minv for m in m_v]

  def rf(vi):  # [2f+6,N] bf16 (saved by the forward)
    return rfres_ref[vi][...]

  mean = jnp.zeros((cfs, n), jnp.float32)
  for vi in range(n_views):
    mean = mean + w_v[vi] * rf(vi).astype(jnp.float32)
  var = jnp.zeros((cfs, n), jnp.float32)
  for vi in range(n_views):
    var = var + w_v[vi] * (rf(vi).astype(jnp.float32) - mean) ** 2
  gfeat0 = jnp.concatenate([mean, var], axis=0).astype(jnp.bfloat16)

  # ---- per-view trunk backward (one view live at a time) ----
  d_gfeat0 = jnp.zeros((2 * cfs, n), jnp.float32)
  d_w = [None] * n_views
  tok = jnp.zeros((1, 1), jnp.float32)
  for vi in range(n_views):
    m = m_v[vi]
    xin = _seq_add(jnp.concatenate([gfeat0, rf(vi)], axis=0), tok)
    a_h, x0 = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], xin, interpret,
                             True)
    xw = (x0 * w_v[vi]).astype(jnp.bfloat16)
    c_h, t = _mlp2_fwd_keep(ws[4], ws[5], ws[6], ws[7], xw, interpret,
                            True)
    x = x0 + t[:128, :]
    sg0 = _sigmoid(t[128:129, :])
    vis0 = sg0 * m
    xv = (x * vis0).astype(jnp.bfloat16)
    e_h, vh = _mlp2_fwd_keep(ws[8], ws[9], ws[10], ws[11], xv, interpret,
                             False)
    sg = _sigmoid(vh)

    d_x = dx_ref[vi][...].astype(jnp.float32)
    d_vis = dmisc_ref[vi, 0:1, :]

    d_vh = sg * (1.0 - sg) * m * d_vis
    d_xv = _mlp2_bwd(ws[8:12], xv, e_h, vh, d_vh, dws[8:12], interpret,
                     False)

    d_x = d_x + vis0 * d_xv
    d_vis0 = _cdot(x, d_xv)
    d_t128 = sg0 * (1.0 - sg0) * m * d_vis0

    d_t = jnp.concatenate([d_x, d_t128], axis=0)
    d_xw = _mlp2_bwd(ws[4:8], xw, c_h, t, d_t, dws[4:8], interpret, True)

    d_x0 = d_x + w_v[vi] * d_xw
    if anti_alias:
      d_w[vi] = _cdot(x0, d_xw)          # x*w trunk-input weight grad

    d_xin = _mlp2_bwd(ws[0:4], xin, a_h, x0, d_x0, dws[0:4], interpret,
                      True)

    d_gfeat0 = d_gfeat0 + d_xin[:2 * cfs, :]
    drf_s[vi] = d_xin[2 * cfs:, :].astype(jnp.bfloat16)
    tok = _seq_token(gws[0])

  # ---- pooling-1 backward -> d_rf_tot residual ----
  d_mean_p = d_gfeat0[:cfs, :]
  d_var_p = d_gfeat0[cfs:, :]
  s0 = jnp.zeros((cfs, n), jnp.float32)
  for vi in range(n_views):
    s0 = s0 + w_v[vi] * (rf(vi).astype(jnp.float32) - mean)
  d_mean_eff = d_mean_p - 2.0 * d_var_p * s0

  for vi in range(n_views):
    rf_f = rf(vi).astype(jnp.float32)
    d_rf1 = (w_v[vi] * d_mean_eff
             + 2.0 * w_v[vi] * (rf_f - mean) * d_var_p)
    if anti_alias:
      d_w[vi] = (d_w[vi] + _cdot(rf_f, d_mean_eff)
                 + _cdot((rf_f - mean) ** 2, d_var_p))
    drftot_ref[vi] = drf_s[vi][...].astype(jnp.float32) + d_rf1

  # ---- anti-alias weight chain -> d_dot / d_s ----
  if anti_alias:
    sw = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      sw = sw + w_v[vi] * d_w[vi]
    d_wp = [winv * (d_w[vi] - sw) for vi in range(n_views)]
    d_emin = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      d_emin = d_emin - m_v[vi] * d_wp[vi]
    cnt = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      cnt = cnt + (ed_v[vi] == emin).astype(jnp.float32)
    d_s_lane = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      d_ed = (m_v[vi] * d_wp[vi]
              + (ed_v[vi] == emin).astype(jnp.float32) / cnt * d_emin)
      ddot_ref[vi] = d_ed * ed_v[vi] * s_abs
      d_s_lane = d_s_lane + d_ed * ed_v[vi] * (dot_v[vi] - 1.0)
    ds_ref[...] = d_s_lane * jnp.sign(s_val)
  else:
    for vi in range(n_views):
      ddot_ref[vi] = jnp.zeros((1, n), jnp.float32)
    ds_ref[...] = jnp.zeros((1, n), jnp.float32)


def static_bwd_inmlp_kernel(pp_ref, reffeat_ref, pv_ref, srcpl_ref,
                            drftot_ref, dmisc_ref, ddot_ref, *refs,
                            n_views: int, feat_ch: int, interpret: bool):
  """Input-MLP (ray_dir_fc) backward: per-view recompute/transpose from the
  d_rf_tot residual; assembles the full d_pv.

  refs: 4 weight refs (ray_dir_fc) | 4 weight-grad out refs | d_pv out
  [V,f+8,n] f32 | d_reffeat out [f+3,n] f32 | d_pp out [3,n] f32 |
  d_srcpl out [V,6,n] f32.
  """
  ws = refs[:4]
  gws = refs[4:8]
  dpv_ref, dreffeat_ref, dpp_ref, dsrcpl_ref = refs[8:12]
  n = pv_ref.shape[2]
  f = feat_ch
  cfs = 2 * f + 6

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for g in gws:
      g[...] = jnp.zeros_like(g)

  dws = _RefAccum(gws)

  pts_pe = _pe_rows(pp_ref[0:3, :], _GEO_FREQS)
  pts_pe_bf = pts_pe.astype(jnp.bfloat16)
  reffeat_f = reffeat_ref[...].astype(jnp.float32)
  d_reffeat = jnp.zeros((f + 3, n), jnp.float32)
  d_ptspe = jnp.zeros((pts_pe.shape[0], n), jnp.float32)
  tok = jnp.zeros((1, 1), jnp.float32)
  for vi in range(n_views):
    d_rf_tot = drftot_ref[vi][...]
    d_c = d_rf_tot[f + 3:cfs, :]

    src_pe = _pe_rows(srcpl_ref[vi, 0:6, :], _GEO_FREQS)
    h_in = _seq_add(jnp.concatenate(
        [pts_pe_bf, src_pe.astype(jnp.bfloat16),
         pv_ref[vi, 3 + f:7 + f, :]], axis=0), tok)            # [103,N]
    hh, sf = _mlp2_fwd_keep(ws[0], ws[1], ws[2], ws[3], h_in, interpret,
                            False)
    d_sf = d_c * reffeat_f
    d_reffeat = d_reffeat + d_c * sf
    d_h = _mlp2_bwd(ws[0:4], h_in, hh, sf, d_sf, dws[0:4], interpret,
                    False)

    n_pe = pts_pe.shape[0]                                     # 33
    d_ptspe = d_ptspe + d_h[0:n_pe, :]
    d_srcpe = d_h[n_pe:n_pe + 66, :]
    dsrcpl_ref[vi] = _pe_bwd(d_srcpe, srcpl_ref[vi, 0:6, :], _GEO_FREQS)

    dpv_ref[vi, 0:3, :] = d_rf_tot[0:3, :] + dmisc_ref[vi, 1:4, :]
    dpv_ref[vi, 3:3 + f, :] = d_rf_tot[3:3 + f, :]
    dpv_ref[vi, 3 + f:6 + f, :] = (d_h[n_pe + 66:n_pe + 69, :]
                                   + dmisc_ref[vi, 4:7, :])
    dpv_ref[vi, 6 + f:7 + f, :] = (d_h[n_pe + 69:n_pe + 70, :]
                                   + dmisc_ref[vi, 7:8, :]
                                   + ddot_ref[vi][...])
    dpv_ref[vi, 7 + f:8 + f, :] = jnp.zeros((1, n), jnp.float32)
    tok = _seq_token(gws[0])

  dreffeat_ref[...] = d_reffeat
  dpp_ref[...] = _pe_bwd(d_ptspe, pp_ref[0:3, :], _GEO_FREQS)
