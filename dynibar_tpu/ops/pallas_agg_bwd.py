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


def _mlp2_bwd(ws4, x_bf, h, y, dy, dws4: List, interpret, final_act):
  """Backward of _mlp2 given stored post-activations; accumulates the four
  weight grads into dws4 (in place), returns dx [I,N] f32."""
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
