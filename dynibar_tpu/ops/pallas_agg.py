"""Fused IBR view-aggregation: one Pallas TPU kernel per aggregator.

The four aggregator invocations are ~2/3 of the eval render step
(scripts/profile_breakdown.py: 300 ms of 457 ms per 4096-ray chunk), yet
their MXU work is ~12 ms — XLA round-trips every [rays, samples, views,
128..256] intermediate through HBM.  This kernel runs the ENTIRE
aggregator — positional encodings, the per-view trunk
(reference mlp_network.py:434-496 / :240-283), both weighted mean/variance
poolings, the ray transformer (:13-104) and the sigma/RGB heads — for a
tile of rays without ever leaving VMEM, reading only the packed per-view
inputs and writing only raw [N, 4].

Layout: everything is *feature-major* — activations are [C, N] with
N = G rays x S samples on lanes and channels on sublanes; weights are
passed transposed [out, in] so every dense layer is one MXU dot with no
relayouts.  The view axis is a static python loop (7-14 iterations) over
VMEM-stashed per-view activations; view reductions (mean/var, softmax
blending) are loop-carried accumulators.

The ray transformer runs as ONE masked attention over all N lane points:
a block-diagonal mask (-1e9 off-block) restricts attention to each ray's
own S samples, which is exactly the per-ray softmax (off-block scores
underflow to 0 after the row-max subtraction); the reference's
query-row masking semantics (invalid queries attend uniformly,
mlp_network.py:23-24) fall out of the same trick.

Numerics vs the flax modules (models/aggregators.py, the parity and
training path): matmuls take bf16 operands with f32 accumulation, and all
reductions/softmaxes/normalizations run in f32 — slightly *closer* to the
f32 reference than the flax bf16 path, which keeps bf16 intermediates.
Forward-only (no VJP): the render cores use it for eval/rendering;
training keeps the flax modules.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynibar_tpu.core.posenc import sample_axis_posenc

# lanes per grid step (points); DYNIBAR_AGG_TILE overrides for sweeps.
# 1024 won a {256, 512, 1024, 2048} sweep on v5e at the eval shapes
# (13.3k / 15.6k / 16.0k rays/s / VMEM-OOM); the differentiable path caps
# at 256 — its backward kernel overlaps the forward recompute's liveness
# with [n, n] attention buffers and 36 weight-grad accumulators (22.6 MB
# scoped at 512 lanes vs the 16 MB limit).
_N_TARGET = int(__import__("os").environ.get("DYNIBAR_AGG_TILE", "1024"))
_N_TARGET_DIFF = min(256, _N_TARGET)
# two-kernel split backward: each kernel holds ~half the fused backward's
# working set, so both the forward (which additionally spills the trunk
# residuals) and the two backward kernels run at 512 lanes
_N_TARGET_SPLIT_FWD = int(__import__("os").environ.get(
    "DYNIBAR_AGG_SPLIT_FWD_TILE", "512"))
_N_TARGET_SPLIT_BWD = int(__import__("os").environ.get(
    "DYNIBAR_AGG_SPLIT_BWD_TILE", "512"))
_GEO_FREQS = tuple(float(2.0 ** e) for e in range(5))  # max_freq=5, n_freq=5


# --------------------------------------------------------------------------
# in-kernel building blocks (feature-major [C, N])
# --------------------------------------------------------------------------


def _elu(x: jnp.ndarray) -> jnp.ndarray:
  """ELU(alpha=1) in f32.  jax.nn.elu lowers through expm1, which Mosaic
  does not implement; exp(x)-1 differs by <1 f32 ulp at these magnitudes."""
  return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _sigmoid(x: jnp.ndarray) -> jnp.ndarray:
  return 1.0 / (1.0 + jnp.exp(-x))


def _pe_rows(x: jnp.ndarray, freqs) -> jnp.ndarray:
  """Periodic embed, feature-major: [C,N] f32 -> [C*(2F+1), N] f32.

  Row layout matches core/posenc.periodic_embed: [x, cos(f0 x)..(f-major,
  channel-minor), sin(...)]."""
  rows = [x]
  rows += [jnp.cos(f * x) for f in freqs]
  rows += [jnp.sin(f * x) for f in freqs]
  return jnp.concatenate(rows, axis=0)


def _dense(wt_ref, b_ref, x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
  """[O,I] (bf16) x [I,N] (bf16) + [O,1] (f32) -> [O,N] f32."""
  w = wt_ref[...]
  if interpret:  # host dot thunk cannot mix bf16 operands w/ f32 accum
    w = w.astype(jnp.float32)
    x = x.astype(jnp.float32)
  else:
    x = x.astype(w.dtype)
  y = lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32)
  if b_ref is not None:
    y = y + b_ref[...]
  return y


def _mlp2(w0, b0, w1, b1, x, interpret, final_act):
  h = _elu(_dense(w0, b0, x, interpret)).astype(jnp.bfloat16)
  y = _dense(w1, b1, h, interpret)
  return _elu(y) if final_act else y


def _attention(ws, gf_bf, numvalid, s_block: int, interpret: bool):
  """Ray transformer over [128, N] feature-major activations.

  ws: (wq, wk, wv, wfc, ln_scale, ln_bias) refs.  gf_bf [128,N] bf16.
  numvalid [1,N] f32.  s_block: samples per ray (block-diagonal extent).
  """
  wq, wk, wv, wfc, ln_s, ln_b = ws
  n = gf_bf.shape[1]
  q = _dense(wq, None, gf_bf, interpret).astype(jnp.bfloat16)   # [128,N]
  k = _dense(wk, None, gf_bf, interpret).astype(jnp.bfloat16)
  v = _dense(wv, None, gf_bf, interpret).astype(jnp.bfloat16)

  blk_q = lax.broadcasted_iota(jnp.int32, (n, n), 0) // s_block
  blk_k = lax.broadcasted_iota(jnp.int32, (n, n), 1) // s_block
  same_ray = blk_q == blk_k
  # query-row mask (reference mlp_network.py:23-24): invalid queries get
  # uniform in-block attention; off-block entries sit ~1e9 lower still, so
  # they underflow to exactly 0 after the row-max subtraction.  The [N,1]
  # column comes from a dot (Mosaic cannot transpose i1 vectors); masking
  # REPLACES the logit (masked_fill semantics) so uniformity is exact for
  # any logit magnitude — adding -1e9 would only be exact up to the f32
  # ulp at 1e9 (64).
  qmask_row = (numvalid <= 1.0).astype(jnp.float32)             # [1,N]
  qmask_col = lax.dot_general(
      qmask_row, jnp.ones((1, 1), jnp.float32), (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)                       # [N,1]
  o_parts = []
  for h in range(4):
    qh = q[32 * h:32 * h + 32, :]
    kh = k[32 * h:32 * h + 32, :]
    vh = v[32 * h:32 * h + 32, :]
    if interpret:
      qh, kh, vh = (a.astype(jnp.float32) for a in (qh, kh, vh))
    logits = lax.dot_general(
        qh, kh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / np.sqrt(32.0))
    logits = jnp.where(qmask_col > 0.5, -1e9, logits)           # [Nq,Nk]
    logits = jnp.where(same_ray, logits, -2e9)
    p = jax.nn.softmax(logits, axis=1)
    p = p.astype(jnp.float32 if interpret else jnp.bfloat16)
    o_parts.append(lax.dot_general(
        vh, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))                    # [32,Nq]
  o = jnp.concatenate(o_parts, axis=0).astype(jnp.bfloat16)     # [128,N]
  o = _dense(wfc, None, o, interpret)                           # f32
  o = o + gf_bf.astype(jnp.float32)                             # residual
  mu = jnp.mean(o, axis=0, keepdims=True)
  var = jnp.mean((o - mu) ** 2, axis=0, keepdims=True)
  o = (o - mu) * lax.rsqrt(var + 1e-6)
  return o * ln_s[...] + ln_b[...]                              # [128,N] f32


def _vis_pooling(ws, get_rf, get_w, n_views, n, interpret,
                 x_s, vis_s, w2_s):
  """Shared trunk (reference mlp_network.py:270-283 / :483-496).

  ws: 16 weight refs (base_fc, vis_fc, vis_fc2, geometry_fc).
  get_rf(v) -> [Cf,N] bf16 per-view feature; get_w(v) -> [1,N] f32 weight;
  stashes x [V,128,N] bf16 + vis [V,1,N] into scratch; returns gf [128,N]
  f32 (geometry_fc output, pre-transformer).
  """
  (b_w0, b_b0, b_w1, b_b1, v_w0, v_b0, v_w1, v_b1,
   v2_w0, v2_b0, v2_w1, v2_b1, g_w0, g_b0, g_w1, g_b1) = ws

  cf = get_rf(0).shape[0]
  mean = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    mean = mean + get_w(vi) * get_rf(vi).astype(jnp.float32)
  var = jnp.zeros((cf, n), jnp.float32)
  for vi in range(n_views):
    var = var + get_w(vi) * (get_rf(vi).astype(jnp.float32) - mean) ** 2
  gfeat0 = jnp.concatenate([mean, var], axis=0).astype(jnp.bfloat16)

  vsum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    xin = jnp.concatenate([gfeat0, get_rf(vi)], axis=0)         # [2Cf+Cf,N]
    x = _mlp2(b_w0, b_b0, b_w1, b_b1, xin, interpret, True)     # [128,N] f32
    xw = (x * get_w(vi)).astype(jnp.bfloat16)
    t = _mlp2(v_w0, v_b0, v_w1, v_b1, xw, interpret, True)      # [129,N]
    x = x + t[:128, :]
    vis0 = _sigmoid(t[128:129, :]) * vis_s[vi, 1:2, :]    # * mask
    xv = (x * vis0).astype(jnp.bfloat16)
    vh = _mlp2(v2_w0, v2_b0, v2_w1, v2_b1, xv, interpret, False)  # [1,N]
    vis = _sigmoid(vh) * vis_s[vi, 1:2, :]
    x_s[vi] = x.astype(jnp.bfloat16)
    vis_s[vi, 0:1, :] = vis
    vsum = vsum + vis

  inv = 1.0 / (vsum + 1e-8)
  mean2 = jnp.zeros((128, n), jnp.float32)
  wmean = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    w2 = vis_s[vi, 0:1, :] * inv
    w2_s[vi, 0:1, :] = w2
    mean2 = mean2 + w2 * x_s[vi].astype(jnp.float32)
    wmean = wmean + w2
  wmean = wmean * (1.0 / n_views)
  var2 = jnp.zeros((128, n), jnp.float32)
  for vi in range(n_views):
    var2 = var2 + w2_s[vi, 0:1, :] * (
        x_s[vi].astype(jnp.float32) - mean2) ** 2
  gf_in = jnp.concatenate(
      [mean2, var2, wmean], axis=0).astype(jnp.bfloat16)        # [257,N]
  return _mlp2(g_w0, g_b0, g_w1, g_b1, gf_in, interpret, True)  # [128,N]


# --------------------------------------------------------------------------
# static aggregator kernel
# --------------------------------------------------------------------------


def _static_kernel(pp_ref, reffeat_ref, pv_ref, srcpl_ref, s_ref,
                   *refs, n_views: int, feat_ch: int, s_block: int,
                   anti_alias: bool, mask_rgb: bool, interpret: bool,
                   emit_residuals: bool = False):
  ws = refs[:36]
  if emit_residuals:
    # split-backward mode: trunk outputs (x, vis/mask) and the per-view
    # input features rf double as OUTPUTS read by the backward kernels
    out_ref, x_s, vis_s, rf_s = refs[36:40]
    w2_s, ed_s, lg_s = refs[40:]
  else:
    out_ref = refs[36]
    rf_s, x_s, vis_s, w2_s, ed_s, lg_s = refs[37:]
  n = pv_ref.shape[2]
  f = feat_ch

  pts_pe = _pe_rows(pp_ref[0:3, :], _GEO_FREQS).astype(jnp.bfloat16)

  # ---- pass A: per-view input features + masks + AA scores ----
  for vi in range(n_views):
    rgb_in = pv_ref[vi, 0:3, :]
    m = pv_ref[vi, 7 + f:8 + f, :].astype(jnp.float32)
    if mask_rgb:
      rgb_sum = jnp.sum(rgb_in.astype(jnp.float32), axis=0, keepdims=True)
      m = m * (rgb_sum > 1e-3).astype(jnp.float32)
    vis_s[vi, 1:2, :] = m                                       # mask slot
    src_pe = _pe_rows(srcpl_ref[vi, 0:6, :], _GEO_FREQS).astype(jnp.bfloat16)
    rd = pv_ref[vi, 3 + f:7 + f, :]
    h = jnp.concatenate([pts_pe, src_pe, rd], axis=0)           # [103,N]
    sf = _mlp2(ws[0], ws[1], ws[2], ws[3], h, interpret, False)  # [35,N]
    rf = jnp.concatenate(
        [pv_ref[vi, 0:3 + f, :].astype(jnp.float32),
         sf * reffeat_ref[...].astype(jnp.float32)], axis=0)
    rf_s[vi] = rf.astype(jnp.bfloat16)                          # [2f+6,N]
    if anti_alias:
      dot = rd[3:4, :].astype(jnp.float32)
      ed_s[vi, 0:1, :] = jnp.exp(jnp.abs(s_ref[0, 0]) * (dot - 1.0))

  # ---- pooling weights ----
  if anti_alias:
    emin = ed_s[0, 0:1, :]
    for vi in range(1, n_views):
      emin = jnp.minimum(emin, ed_s[vi, 0:1, :])
    wsum = jnp.zeros_like(emin)
    for vi in range(n_views):
      ed_s[vi, 1:2, :] = (ed_s[vi, 0:1, :] - emin) * vis_s[vi, 1:2, :]
      wsum = wsum + ed_s[vi, 1:2, :]
    winv = 1.0 / (wsum + 1e-8)
    get_w = lambda vi: ed_s[vi, 1:2, :] * winv
  else:
    msum = jnp.zeros((1, n), jnp.float32)
    for vi in range(n_views):
      msum = msum + vis_s[vi, 1:2, :]
    minv = 1.0 / (msum + 1e-8)
    get_w = lambda vi: vis_s[vi, 1:2, :] * minv

  gf = _vis_pooling(ws[4:20], lambda vi: rf_s[vi], get_w, n_views, n,
                    interpret, x_s, vis_s, w2_s)

  numvalid = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    numvalid = numvalid + vis_s[vi, 1:2, :]

  gf = _attention(ws[20:26], gf.astype(jnp.bfloat16), numvalid, s_block,
                  interpret)
  gf_bf = gf.astype(jnp.bfloat16)

  sigma = _mlp2(ws[26], ws[27], ws[28], ws[29], gf_bf, interpret, False)
  sigma = jnp.where(numvalid < 1.0, -1e9, sigma)                # [1,N]

  # ---- RGB head: per-view blending logits -> softmax over views ----
  lmax = jnp.full((1, n), -jnp.inf, jnp.float32)
  for vi in range(n_views):
    h = jnp.concatenate(
        [gf_bf, x_s[vi][...], vis_s[vi, 0:1, :].astype(jnp.bfloat16),
         pv_ref[vi, 3 + f:7 + f, :]], axis=0)                   # [261,N]
    h1 = _elu(_dense(ws[30], ws[31], h, interpret)).astype(jnp.bfloat16)
    h2 = _elu(_dense(ws[32], ws[33], h1, interpret)).astype(
        jnp.bfloat16)
    logit = _dense(ws[34], ws[35], h2, interpret)               # [1,N]
    logit = jnp.where(vis_s[vi, 1:2, :] == 0.0, -1e9, logit)
    lg_s[vi, 0:1, :] = logit
    lmax = jnp.maximum(lmax, logit)
  bsum = jnp.zeros((1, n), jnp.float32)
  rgb = jnp.zeros((3, n), jnp.float32)
  for vi in range(n_views):
    b = jnp.exp(lg_s[vi, 0:1, :] - lmax)
    bsum = bsum + b
    rgb = rgb + b * pv_ref[vi, 0:3, :].astype(jnp.float32)
  rgb = rgb / bsum

  out_ref[0:3, :] = rgb
  out_ref[3:4, :] = sigma


# --------------------------------------------------------------------------
# dynamic aggregator kernel
# --------------------------------------------------------------------------


def _dynamic_kernel(pp_ref, dirfeat_ref, dirpe_ref, posenc_ref, pv_ref,
                    *refs, n_views: int, feat_ch: int, s_block: int,
                    shift: float, interpret: bool,
                    emit_residuals: bool = False):
  ws = refs[:36]
  if emit_residuals:
    # split-backward mode: the per-view trunk outputs double as OUTPUTS
    # (read back by the ray-side backward kernel) instead of scratch
    out_ref, x_s, vis_s = refs[36:39]
    rf_s, w2_s = refs[39:]
  else:
    out_ref = refs[36]
    rf_s, x_s, vis_s, w2_s = refs[37:]
  n = pv_ref.shape[2]
  f = feat_ch

  # ---- per-view features: rgb_feat + broadcast direction feature ----
  msum = jnp.zeros((1, n), jnp.float32)
  for vi in range(n_views):
    m = pv_ref[vi, 3 + f:4 + f, :].astype(jnp.float32)
    vis_s[vi, 1:2, :] = m
    msum = msum + m
    rf_s[vi] = pv_ref[vi, 0:3 + f, :] + dirfeat_ref[...]
  minv = 1.0 / (msum + 1e-8)
  get_w = lambda vi: vis_s[vi, 1:2, :] * minv

  gf = _vis_pooling(ws[:16], lambda vi: rf_s[vi][...], get_w, n_views, n,
                    interpret, x_s, vis_s, w2_s)

  gf = gf + posenc_ref[...]                                     # sample PE
  gf = _attention(ws[16:22], gf.astype(jnp.bfloat16), msum, s_block,
                  interpret)

  pts_pe = _pe_rows(pp_ref[0:3, :], _GEO_FREQS).astype(jnp.bfloat16)
  gf = _mlp2(ws[22], ws[23], ws[24], ws[25],
             jnp.concatenate([gf.astype(jnp.bfloat16), pts_pe], axis=0),
             interpret, True)                                   # ref_pts_fc
  gf_bf = gf.astype(jnp.bfloat16)

  sigma = _mlp2(ws[26], ws[27], ws[28], ws[29], gf_bf, interpret,
                False) - shift
  sigma = jnp.where(msum < 1.0, -1e9, sigma)

  h = jnp.concatenate([gf_bf, dirpe_ref[...]], axis=0)          # [155,N]
  h = _elu(_dense(ws[30], ws[31], h, interpret)).astype(jnp.bfloat16)
  h = _elu(_dense(ws[32], ws[33], h, interpret)).astype(jnp.bfloat16)
  rgb = _sigmoid(_dense(ws[34], ws[35], h, interpret))    # [3,N]
  rgb = jnp.where(msum > 0.0, rgb, 0.0)

  out_ref[0:3, :] = rgb
  out_ref[3:4, :] = sigma


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


_BWD_CHUNK = int(__import__("os").environ.get("DYNIBAR_AGG_BWD_CHUNK",
                                              "512"))


def attach_flax_grad(fused_fn, flax_fn, bwd_chunk: int = _BWD_CHUNK):
  """Differentiable fused aggregator: Pallas forward, flax backward.

  Returns f(params, *args) whose primal is `fused_fn` (the VMEM-resident
  kernel) and whose VJP is `jax.vjp(flax_fn, ...)` — i.e. exactly the
  gradients the flax module would produce, with the module's forward
  recomputed inside the backward pass (the rematerialization the training
  step does anyway, models/dynibar._maybe_remat).  Net effect on a train
  step: the primal forward gets the kernel's speed and stops storing the
  [rays, samples, views, 128..256] flax intermediates; gradient math is
  unchanged.  The ~1e-4 primal deviation (tests/test_pallas_agg.py) is of
  the same order as the bf16 flax forward's own rounding.

  The backward runs as a `lax.map` over ray chunks of `bwd_chunk` (the
  aggregators have no cross-ray interaction — attention is per-ray along
  samples), so only one chunk's linearization residuals are live at a
  time: a single un-chunked vjp of the static aggregator at the reference
  training shape keeps ~4 GB of [R,S,V,128..256] residuals alive and the
  step OOMs HBM.  Chunking applies when it divides the ray count; grads
  agree either way up to float summation order (param grads are per-ray
  sums, accumulated per chunk).
  """
  @jax.custom_vjp
  def f(p, *args):
    return fused_fn(p, *args)

  def fwd(p, *args):
    return fused_fn(p, *args), (p, args)

  def bwd(res, cot):
    p, args = res
    r = args[0].shape[0]
    if 0 < bwd_chunk < r and r % bwd_chunk == 0:
      nc = r // bwd_chunk
      ch_args = tuple(a.reshape((nc, bwd_chunk) + a.shape[1:])
                      for a in args)
      ch_cot = cot.reshape((nc, bwd_chunk) + cot.shape[1:])

      def one(xs):
        ca, cc = xs
        _, vjp = jax.vjp(flax_fn, p, *ca)
        return vjp(cc)

      grads = lax.map(one, (ch_args, ch_cot))
      gp = jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), grads[0])
      gargs = tuple(g.reshape((r,) + g.shape[2:]) for g in grads[1:])
      return (gp,) + gargs
    _, vjp = jax.vjp(flax_fn, p, *args)
    return vjp(cot)

  f.defvjp(fwd, bwd)
  return f


def _wt(p: Dict[str, Any], *path):
  w = p
  for k in path:
    w = w[k]
  return jnp.transpose(w).astype(jnp.bfloat16)


def _b(p: Dict[str, Any], *path):
  w = p
  for k in path:
    w = w[k]
  return w.astype(jnp.float32)[:, None]


def _mlp_ws(p, name):
  return [_wt(p, name, "dense_0", "kernel"), _b(p, name, "dense_0", "bias"),
          _wt(p, name, "dense_1", "kernel"), _b(p, name, "dense_1", "bias")]


def _mlp3_ws(p, name):
  return (_mlp_ws(p, name)
          + [_wt(p, name, "dense_2", "kernel"),
             _b(p, name, "dense_2", "bias")])


def _pooling_ws(p):
  vp = p["vis_pooling"]
  return (_mlp_ws(vp, "base_fc") + _mlp_ws(vp, "vis_fc")
          + _mlp_ws(vp, "vis_fc2") + _mlp_ws(vp, "geometry_fc"))


def _attn_ws(p):
  a = p["ray_attention"]
  return [_wt(a, "w_qs", "kernel"), _wt(a, "w_ks", "kernel"),
          _wt(a, "w_vs", "kernel"), _wt(a, "fc", "kernel"),
          _b(a, "layer_norm", "scale"), _b(a, "layer_norm", "bias")]


def _tile_layout(r: int, s: int, n_target: int = 0, v: int = 1):
  """Pick the lane tile.  The kernels' VMEM footprint scales with
  v * n_t (per-view inputs + scratch); v=14 static at 1024 lanes blows
  the 16 MB scoped-vmem limit, so halve until v * n_t fits."""
  n_target = n_target or _N_TARGET
  while n_target > 512 and v * n_target > 11 * 1024:
    n_target //= 2
  g = max(1, n_target // s)
  r_pad = (-r) % g
  return g, r_pad, g * s


def _split_bwd_tile(n: int, s_block: int, v: int, cap: int,
                    v_lane_budget: int = 2816) -> int:
  """Lane tile for the split backward kernels.

  The ray kernel's working set scales with v * lanes (per-view residual +
  cotangent tiles) plus lanes^2 (attention buffers); v=10 at 512 lanes
  exceeds the 16 MB scoped-vmem limit, and a kernel embedded in the full
  train step has ~1 MB less effective headroom than the same kernel
  compiled standalone (layout copies).  Pick the largest 64-multiple tile
  with v * lanes <= v_lane_budget that divides the padded lane count.

  Budget 2816 (was 4096): the FF coarse trainer's V=7 dynamic stage
  slipped through the old budget to a 512-lane tile (7*512 = 3584) and
  busted the scoped limit by 254 KB on hardware.  2816 caps V=6/7 at a
  384-lane tile (<= 0.75x the failing allocation — comfortable) when the
  padded lane count is divisible by 384, else the usual power-of-two
  count lands them at 256; both fit.  Every verified mono configuration
  (V=9/10 -> 256 lanes) is unchanged.

  The STATIC trunk kernel carries a heavier per-view recompute (input MLP
  + AA weight chain) whose live range Mosaic's stack allocator only
  partially reuses across the unrolled view loop — at V=14 it needs
  v * lanes <= 2048 (128 lanes) to fit the 16 MB scoped-vmem limit even
  with ref-serialized weight-grad accumulation (_RefAccum).

  Candidates are multiples of 128 only: Mosaic requires the lane block
  dimension be divisible by 128."""
  for cand in (512, 384, 256, 128):
    if cand <= cap and v * cand <= v_lane_budget and n % cand == 0:
      return cand
  return s_block


def _to_feature_major(x: jnp.ndarray, r_pad: int) -> jnp.ndarray:
  """[R,S,V,C] -> [V, C, (R+pad)*S] (padded rays are zeros -> mask 0)."""
  if r_pad:
    x = jnp.pad(x, ((0, r_pad), (0, 0), (0, 0), (0, 0)))
  v, c = x.shape[2], x.shape[3]
  return jnp.transpose(x, (2, 3, 0, 1)).reshape(v, c, -1)


def _point_major(x: jnp.ndarray, r_pad: int) -> jnp.ndarray:
  """[R,S,C] -> [C, (R+pad)*S], lanes ordered ray-major."""
  if r_pad:
    x = jnp.pad(x, ((0, r_pad), (0, 0), (0, 0)))
  return jnp.transpose(x, (2, 0, 1)).reshape(x.shape[2], -1)


def _full_spec(arrs):
  return [pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                       memory_space=pltpu.VMEM) for a in arrs]


def _make_st_core_diff_split(v, f, s_block, n_t, n_t_ray, n_t_trunk, n,
                             interpret, anti_alias, mask_rgb,
                             three_kernel=False, n_t_inmlp=0):
  """custom_vjp core for the STATIC aggregator: Pallas forward emitting
  trunk residuals (x, vis/mask, rf) + ray/trunk backward kernels
  (ops/pallas_agg_bwd.static_bwd_*).

  The two backward kernels take independent lane tiles: the trunk kernel's
  per-view recompute caps it at 128 lanes for V=14, but the ray kernel
  (attention + heads, no per-view MLP recompute) fits larger tiles — a
  shared tile would halve its throughput for nothing.

  three_kernel=True further splits the trunk kernel at the d_rf seam
  (pallas_agg_bwd.static_bwd_trunk3_kernel + static_bwd_inmlp_kernel):
  the per-view input MLP moves to its own kernel so the trunk tile can
  grow past 128 lanes (pallas_bwd="split3")."""
  from dynibar_tpu.ops import pallas_agg_bwd

  cfs = 2 * f + 6

  def _lane2(c, t):
    return pl.BlockSpec((c, t), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def _lane3(a, c, t):
    return pl.BlockSpec((a, c, t), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)

  def fwd_call(ws, pp, reffeat, pv, srcpl, s_par):
    kernel = functools.partial(
        _static_kernel, n_views=v, feat_ch=f, s_block=s_block,
        anti_alias=anti_alias, mask_rgb=mask_rgb, interpret=interpret,
        emit_residuals=True)
    in_specs = [
        pl.BlockSpec((3, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((f + 3, n_t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((v, f + 8, n_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((v, 6, n_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ] + _full_spec(ws)
    return pl.pallas_call(
        kernel,
        grid=(n // n_t,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((4, n_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 128, n_t), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 8, n_t), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, cfs, n_t), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((v, 128, n), jnp.bfloat16),   # x
            jax.ShapeDtypeStruct((v, 8, n), jnp.float32),      # vis/mask
            jax.ShapeDtypeStruct((v, cfs, n), jnp.bfloat16),   # rf
        ],
        scratch_shapes=[
            pltpu.VMEM((v, 8, n_t), jnp.float32),          # w2
            pltpu.VMEM((v, 8, n_t), jnp.float32),          # AA scores
            pltpu.VMEM((v, 8, n_t), jnp.float32),          # blend logits
        ],
        interpret=interpret,
    )(pp, reffeat, pv, srcpl, s_par, *ws)

  @jax.custom_vjp
  def core(ws, pp, reffeat, pv, srcpl, s_par):
    out, _, _, _ = fwd_call(ws, pp, reffeat, pv, srcpl, s_par)
    return out

  def core_fwd(ws, pp, reffeat, pv, srcpl, s_par):
    out, xres, visres, rfres = fwd_call(ws, pp, reffeat, pv, srcpl, s_par)
    return out, (ws, pp, reffeat, pv, srcpl, s_par, xres, visres, rfres)

  def core_bwd(res, cot):
    ws, pp, reffeat, pv, srcpl, s_par, xres, visres, rfres = res
    ws_trunk = tuple(ws[0:4]) + tuple(ws[4:16])   # ray_dir_fc + trunk
    ws_ray = tuple(ws[16:36])                     # geometry|attn|sigma|rgb

    ray_kernel = functools.partial(
        pallas_agg_bwd.static_bwd_ray_kernel, n_views=v, feat_ch=f,
        s_block=s_block, interpret=interpret)
    r_out_shapes = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_ray]
        + [jax.ShapeDtypeStruct((v, 128, n), jnp.bfloat16),    # d_x
           jax.ShapeDtypeStruct((v, 8, n), jnp.float32)])      # d_misc
    r_out_specs = (
        [pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                      memory_space=pltpu.VMEM) for w in ws_ray]
        + [_lane3(v, 128, n_t_ray), _lane3(v, 8, n_t_ray)])
    r_outs = pl.pallas_call(
        ray_kernel,
        grid=(n // n_t_ray,),
        in_specs=[
            _lane3(v, f + 8, n_t_ray),                         # pv
            _lane3(v, 128, n_t_ray),                           # x residual
            _lane3(v, 8, n_t_ray),                             # vis/mask
            _lane2(4, n_t_ray),                                # cotangent
        ] + _full_spec(ws_ray),
        out_specs=r_out_specs,
        out_shape=r_out_shapes,
        interpret=interpret,
    )(pv, xres, visres, cot, *ws_ray)
    d_ws_ray = r_outs[:20]
    d_x, d_misc = r_outs[20:]

    if three_kernel:
      trunk3_kernel = functools.partial(
          pallas_agg_bwd.static_bwd_trunk3_kernel, n_views=v, feat_ch=f,
          anti_alias=anti_alias, mask_rgb=mask_rgb, interpret=interpret)
      ws_trunk3 = tuple(ws[4:16])            # base_fc | vis_fc | vis_fc2
      t3_out_shapes = (
          [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_trunk3]
          + [jax.ShapeDtypeStruct((v, cfs, n), jnp.float32),   # d_rf_tot
             jax.ShapeDtypeStruct((v, 1, n), jnp.float32),     # d_dot
             jax.ShapeDtypeStruct((1, n), jnp.float32)])       # d_s lanes
      t3_out_specs = (
          [pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                        memory_space=pltpu.VMEM) for w in ws_trunk3]
          + [_lane3(v, cfs, n_t_trunk), _lane3(v, 1, n_t_trunk),
             _lane2(1, n_t_trunk)])
      t3_outs = pl.pallas_call(
          trunk3_kernel,
          grid=(n // n_t_trunk,),
          in_specs=[
              _lane3(v, f + 8, n_t_trunk),                     # pv
              pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM),           # s
              _lane3(v, cfs, n_t_trunk),                       # rf residual
              _lane3(v, 128, n_t_trunk),                       # d_x
              _lane3(v, 8, n_t_trunk),                         # d_misc
          ] + _full_spec(ws_trunk3),
          out_specs=t3_out_specs,
          out_shape=t3_out_shapes,
          scratch_shapes=[
              pltpu.VMEM((v, cfs, n_t_trunk), jnp.bfloat16),   # d_rf stash
          ],
          interpret=interpret,
      )(pv, s_par, rfres, d_x, d_misc, *ws_trunk3)
      d_ws_trunk3 = t3_outs[:12]
      d_rftot, d_dot, d_s_lanes = t3_outs[12:]

      inmlp_kernel = functools.partial(
          pallas_agg_bwd.static_bwd_inmlp_kernel, n_views=v, feat_ch=f,
          interpret=interpret)
      ws_inmlp = tuple(ws[0:4])                                # ray_dir_fc
      m_out_shapes = (
          [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_inmlp]
          + [jax.ShapeDtypeStruct((v, f + 8, n), jnp.float32),  # d_pv
             jax.ShapeDtypeStruct((f + 3, n), jnp.float32),     # d_reffeat
             jax.ShapeDtypeStruct((3, n), jnp.float32),         # d_pp
             jax.ShapeDtypeStruct((v, 6, n), jnp.float32)])     # d_srcpl
      m_out_specs = (
          [pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                        memory_space=pltpu.VMEM) for w in ws_inmlp]
          + [_lane3(v, f + 8, n_t_inmlp), _lane2(f + 3, n_t_inmlp),
             _lane2(3, n_t_inmlp), _lane3(v, 6, n_t_inmlp)])
      m_outs = pl.pallas_call(
          inmlp_kernel,
          grid=(n // n_t_inmlp,),
          in_specs=[
              _lane2(3, n_t_inmlp),                            # pp
              _lane2(f + 3, n_t_inmlp),                        # reffeat
              _lane3(v, f + 8, n_t_inmlp),                     # pv
              _lane3(v, 6, n_t_inmlp),                         # srcpl
              _lane3(v, cfs, n_t_inmlp),                       # d_rf_tot
              _lane3(v, 8, n_t_inmlp),                         # d_misc
              _lane3(v, 1, n_t_inmlp),                         # d_dot
          ] + _full_spec(ws_inmlp),
          out_specs=m_out_specs,
          out_shape=m_out_shapes,
          interpret=interpret,
      )(pp, reffeat, pv, srcpl, d_rftot, d_misc, d_dot, *ws_inmlp)
      d_ws_inmlp = m_outs[:4]
      d_pv, d_reffeat, d_pp, d_srcpl = m_outs[4:]

      d_ws = tuple(g.astype(w.dtype)
                   for g, w in zip(tuple(d_ws_inmlp) + tuple(d_ws_trunk3)
                                   + tuple(d_ws_ray), ws))
      d_s = jnp.sum(d_s_lanes).reshape(s_par.shape).astype(s_par.dtype)
      return (d_ws, d_pp, d_reffeat.astype(reffeat.dtype),
              d_pv.astype(pv.dtype), d_srcpl.astype(srcpl.dtype), d_s)

    trunk_kernel = functools.partial(
        pallas_agg_bwd.static_bwd_trunk_kernel, n_views=v, feat_ch=f,
        anti_alias=anti_alias, mask_rgb=mask_rgb, interpret=interpret)
    t_out_shapes = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_trunk]
        + [jax.ShapeDtypeStruct((v, f + 8, n), jnp.float32),   # d_pv
           jax.ShapeDtypeStruct((f + 3, n), jnp.float32),      # d_reffeat
           jax.ShapeDtypeStruct((3, n), jnp.float32),          # d_pp
           jax.ShapeDtypeStruct((v, 6, n), jnp.float32),       # d_srcpl
           jax.ShapeDtypeStruct((1, n), jnp.float32)])         # d_s lanes
    t_out_specs = (
        [pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                      memory_space=pltpu.VMEM) for w in ws_trunk]
        + [_lane3(v, f + 8, n_t_trunk), _lane2(f + 3, n_t_trunk),
           _lane2(3, n_t_trunk), _lane3(v, 6, n_t_trunk),
           _lane2(1, n_t_trunk)])
    t_outs = pl.pallas_call(
        trunk_kernel,
        grid=(n // n_t_trunk,),
        in_specs=[
            _lane2(3, n_t_trunk),                              # pp
            _lane2(f + 3, n_t_trunk),                          # reffeat
            _lane3(v, f + 8, n_t_trunk),                       # pv
            _lane3(v, 6, n_t_trunk),                           # srcpl
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),             # s
            _lane3(v, cfs, n_t_trunk),                         # rf residual
            _lane3(v, 128, n_t_trunk),                         # d_x
            _lane3(v, 8, n_t_trunk),                           # d_misc
        ] + _full_spec(ws_trunk),
        out_specs=t_out_specs,
        out_shape=t_out_shapes,
        scratch_shapes=[
            pltpu.VMEM((v, cfs, n_t_trunk), jnp.bfloat16),     # d_rf stash
        ],
        interpret=interpret,
    )(pp, reffeat, pv, srcpl, s_par, rfres, d_x, d_misc, *ws_trunk)
    d_ws_trunk = t_outs[:16]
    d_pv, d_reffeat, d_pp, d_srcpl, d_s_lanes = t_outs[16:]

    d_ws = tuple(g.astype(w.dtype)
                 for g, w in zip(tuple(d_ws_trunk) + tuple(d_ws_ray), ws))
    d_s = jnp.sum(d_s_lanes).reshape(s_par.shape).astype(s_par.dtype)
    return (d_ws, d_pp, d_reffeat.astype(reffeat.dtype),
            d_pv.astype(pv.dtype), d_srcpl.astype(srcpl.dtype), d_s)

  core.defvjp(core_fwd, core_bwd)
  return core


def fused_static_aggregator(p: Dict[str, Any], pts, ref_pl, src_pl,
                            rgb_feat, glb_ray_dir, ray_diff, mask, *,
                            anti_alias_pooling: bool = True,
                            mask_rgb: bool = True,
                            interpret: bool = False,
                            pallas_bwd: bool = False,
                            pv_cm=None, src_pl_cm=None,
                            shape=None) -> jnp.ndarray:
  """Drop-in fused forward of models.aggregators.StaticAggregator.

  Same array arguments as the flax module's __call__ (glb_ray_dir accepted
  for parity, unused — reference never reads it); returns raw [R,S,4].

  pv_cm: optional pre-packed per-view input [V, f+8, N] (channels:
  rgb_feat, ray_diff, mask) in the kernel's native feature-major layout
  (see fused_dynamic_aggregator); src_pl_cm the matching [V, 6, N]
  source-Plücker relayout; `shape`=(r, s, v, 3+f).
  """
  del glb_ray_dir
  from dynibar_tpu.core.posenc import periodic_embed
  if pv_cm is not None:
    assert not pallas_bwd, "pv_cm is an eval-path (forward-only) handoff"
    r, s, v, cfull = shape
  else:
    r, s, v, cfull = rgb_feat.shape
  f = cfull - 3
  g, r_pad, n_t = _tile_layout(
      r, s,
      _N_TARGET_SPLIT_FWD if pallas_bwd in ("split", "split3") else 0, v=v)
  n = (r + r_pad) * s

  ref_pe = periodic_embed(ref_pl, max_freq=5, n_freq=5,
                          linspace=False).astype(jnp.bfloat16)  # [R,66]
  rk = p["ref_feature_fc"]
  reffeat = (ref_pe @ rk["kernel"].astype(jnp.bfloat16)
             + rk["bias"].astype(jnp.bfloat16))                 # [R,35]
  reffeat = jnp.broadcast_to(reffeat[:, None, :], (r, s, f + 3))
  reffeat = _point_major(reffeat.astype(jnp.bfloat16), r_pad)   # [35,N]

  if pv_cm is not None:
    pv = pv_cm.astype(jnp.bfloat16)
    srcpl = src_pl_cm.astype(jnp.float32)
    if r_pad:
      pv = jnp.pad(pv, ((0, 0), (0, 0), (0, r_pad * s)))
      srcpl = jnp.pad(srcpl, ((0, 0), (0, 0), (0, r_pad * s)))
  else:
    pv = jnp.concatenate(
        [rgb_feat.astype(jnp.bfloat16), ray_diff.astype(jnp.bfloat16),
         mask.astype(jnp.bfloat16)], axis=-1)                   # [R,S,V,f+8]
    pv = _to_feature_major(pv, r_pad)
    srcpl = _to_feature_major(src_pl.astype(jnp.float32), r_pad)
  pp = _point_major(pts.astype(jnp.float32), r_pad)             # [3,N]
  s_par = jnp.asarray(p["s"] if anti_alias_pooling else 0.0,
                      jnp.float32).reshape(1, 1)

  ws = (_mlp_ws(p, "ray_dir_fc") + _pooling_ws(p) + _attn_ws(p)
        + _mlp_ws(p, "out_geometry_fc") + _mlp3_ws(p, "rgb_fc"))

  if pallas_bwd in ("split", "split3"):
    env = __import__("os").environ
    # DYNIBAR_AGG_ST_BWD3=1 upgrades "split" to the three-kernel variant
    # (trunk without the input MLP) without touching any config — the
    # hardware sweep is one env var
    three = (pallas_bwd == "split3"
             or env.get("DYNIBAR_AGG_ST_BWD3", "0") == "1")
    cap = min(_N_TARGET_SPLIT_BWD, n_t)
    # the ray kernel has no per-view MLP recompute, so it can in principle
    # take the dynamic kernels' 4096 budget (256 lanes at V=14) — raise
    # via env once compile-verified on hardware; default matches the
    # trunk kernel's verified 128-lane tile
    n_t_ray = _split_bwd_tile(
        n, s, v, cap, v_lane_budget=int(env.get(
            "DYNIBAR_AGG_SPLIT_ST_RAY_VLANES", "2048")))
    n_t_trunk = _split_bwd_tile(
        n, s, v, cap, v_lane_budget=int(env.get(
            "DYNIBAR_AGG_SPLIT_ST_VLANES", "2048")))
    n_t_inmlp = _split_bwd_tile(
        n, s, v, cap, v_lane_budget=int(env.get(
            "DYNIBAR_AGG_SPLIT_ST_INMLP_VLANES", "4096")))
    out = _make_st_core_diff_split(
        v, f, s, n_t, n_t_ray, n_t_trunk, n, interpret,
        anti_alias_pooling, mask_rgb, three_kernel=three,
        n_t_inmlp=n_t_inmlp)(tuple(ws), pp, reffeat, pv, srcpl, s_par)
    raw = out.reshape(4, r + r_pad, s)[:, :r]
    return jnp.transpose(raw, (1, 2, 0))

  kernel = functools.partial(
      _static_kernel, n_views=v, feat_ch=f, s_block=s,
      anti_alias=anti_alias_pooling, mask_rgb=mask_rgb, interpret=interpret)

  grid = (n // n_t,)
  in_specs = [
      pl.BlockSpec((3, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
      pl.BlockSpec((f + 3, n_t), lambda i: (0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((v, f + 8, n_t), lambda i: (0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((v, 6, n_t), lambda i: (0, 0, i),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
  ] + _full_spec(ws)

  out = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=pl.BlockSpec((4, n_t), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((v, 2 * f + 6, n_t), jnp.bfloat16),   # rf
          pltpu.VMEM((v, 128, n_t), jnp.bfloat16),         # x
          pltpu.VMEM((v, 8, n_t), jnp.float32),            # vis(0)/mask(1)
          pltpu.VMEM((v, 8, n_t), jnp.float32),            # w2
          pltpu.VMEM((v, 8, n_t), jnp.float32),            # AA scores
          pltpu.VMEM((v, 8, n_t), jnp.float32),            # blend logits
      ],
      interpret=interpret,
  )(pp, reffeat, pv, srcpl, s_par, *ws)

  raw = out.reshape(4, r + r_pad, s)[:, :r]
  return jnp.transpose(raw, (1, 2, 0))


def _make_dyn_core_diff(v, f, s_block, shift, n_t, n, interpret):
  """custom_vjp core over the packed feature-major operands: Pallas
  forward + hand-written Pallas backward (ops/pallas_agg_bwd.py)."""
  from dynibar_tpu.ops import pallas_agg_bwd

  def fwd_call(ws, pp, dirfeat, dirpe, pe, pv):
    kernel = functools.partial(
        _dynamic_kernel, n_views=v, feat_ch=f, s_block=s_block,
        shift=shift, interpret=interpret)
    in_specs = [
        pl.BlockSpec((3, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((f + 3, n_t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((128, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((v, f + 4, n_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ] + _full_spec(ws)
    return pl.pallas_call(
        kernel,
        grid=(n // n_t,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, n_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((v, f + 3, n_t), jnp.bfloat16),
            pltpu.VMEM((v, 128, n_t), jnp.bfloat16),
            pltpu.VMEM((v, 8, n_t), jnp.float32),
            pltpu.VMEM((v, 8, n_t), jnp.float32),
        ],
        interpret=interpret,
    )(pp, dirfeat, dirpe, pe, pv, *ws)

  @jax.custom_vjp
  def core(ws, pp, dirfeat, dirpe, pe, pv):
    return fwd_call(ws, pp, dirfeat, dirpe, pe, pv)

  def core_fwd(ws, pp, dirfeat, dirpe, pe, pv):
    return fwd_call(ws, pp, dirfeat, dirpe, pe, pv), (
        ws, pp, dirfeat, dirpe, pe, pv)

  def core_bwd(res, cot):
    ws, pp, dirfeat, dirpe, pe, pv = res
    kernel = functools.partial(
        pallas_agg_bwd.dynamic_bwd_kernel, n_views=v, feat_ch=f,
        s_block=s_block, interpret=interpret)
    in_specs = [
        pl.BlockSpec((3, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((f + 3, n_t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((128, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((v, f + 4, n_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
    ] + _full_spec(ws)
    out_shapes = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct((v, f + 4, n), jnp.float32),
           jax.ShapeDtypeStruct((3, n), jnp.float32),
           jax.ShapeDtypeStruct((f + 3, n), jnp.float32),
           jax.ShapeDtypeStruct((27, n), jnp.float32)])
    out_specs = (
        [pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                      memory_space=pltpu.VMEM) for w in ws]
        + [pl.BlockSpec((v, f + 4, n_t), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((3, n_t), lambda i: (0, i),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((f + 3, n_t), lambda i: (0, i),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((27, n_t), lambda i: (0, i),
                        memory_space=pltpu.VMEM)])
    outs = pl.pallas_call(
        kernel,
        grid=(n // n_t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((v, 128, n_t), jnp.bfloat16),   # x (bf16-rounded)
            pltpu.VMEM((v, 8, n_t), jnp.float32),      # vis(0)/mask(1)
        ],
        interpret=interpret,
    )(pp, dirfeat, dirpe, pe, pv, cot, *ws)
    d_ws = tuple(g.astype(w.dtype) for g, w in zip(outs[:len(ws)], ws))
    d_pv, d_pp, d_dirfeat, d_dirpe = outs[len(ws):]
    return (d_ws, d_pp, d_dirfeat.astype(dirfeat.dtype),
            d_dirpe.astype(dirpe.dtype), jnp.zeros_like(pe),
            d_pv.astype(pv.dtype))

  core.defvjp(core_fwd, core_bwd)
  return core


def _make_dyn_core_diff_split(v, f, s_block, shift, n_t, n_t_bwd, n,
                              interpret):
  """custom_vjp core: Pallas forward emitting trunk residuals + TWO
  backward kernels (ray-side / trunk-side, ops/pallas_agg_bwd)."""
  from dynibar_tpu.ops import pallas_agg_bwd

  cf = f + 3

  def _lane2(c):
    return pl.BlockSpec((c, n_t_bwd), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def _lane3(a, c, dtype=None):
    del dtype
    return pl.BlockSpec((a, c, n_t_bwd), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)

  def fwd_call(ws, pp, dirfeat, dirpe, pe, pv):
    kernel = functools.partial(
        _dynamic_kernel, n_views=v, feat_ch=f, s_block=s_block,
        shift=shift, interpret=interpret, emit_residuals=True)
    in_specs = [
        pl.BlockSpec((3, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((f + 3, n_t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((128, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((v, f + 4, n_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ] + _full_spec(ws)
    return pl.pallas_call(
        kernel,
        grid=(n // n_t,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((4, n_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 128, n_t), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 8, n_t), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((v, 128, n), jnp.bfloat16),   # x residual
            jax.ShapeDtypeStruct((v, 8, n), jnp.float32),      # vis/mask
        ],
        scratch_shapes=[
            pltpu.VMEM((v, f + 3, n_t), jnp.bfloat16),     # rf
            pltpu.VMEM((v, 8, n_t), jnp.float32),          # w2
        ],
        interpret=interpret,
    )(pp, dirfeat, dirpe, pe, pv, *ws)

  @jax.custom_vjp
  def core(ws, pp, dirfeat, dirpe, pe, pv):
    out, _, _ = fwd_call(ws, pp, dirfeat, dirpe, pe, pv)
    return out

  def core_fwd(ws, pp, dirfeat, dirpe, pe, pv):
    out, xres, visres = fwd_call(ws, pp, dirfeat, dirpe, pe, pv)
    return out, (ws, pp, dirfeat, dirpe, pe, pv, xres, visres)

  def core_bwd(res, cot):
    ws, pp, dirfeat, dirpe, pe, pv, xres, visres = res
    ws_trunk, ws_ray = tuple(ws[:12]), tuple(ws[12:36])
    # re-tile the (s-periodic) sample posenc to the backward lane tile
    pe_b = jnp.tile(pe[:, :s_block], (1, n_t_bwd // s_block))

    ray_kernel = functools.partial(
        pallas_agg_bwd.dynamic_bwd_ray_kernel, n_views=v,
        s_block=s_block, interpret=interpret)
    r_out_shapes = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_ray]
        # d_x rides to the trunk kernel in bf16: halves the inter-kernel
        # HBM traffic AND keeps the ray kernel under the 16M scoped-vmem
        # limit at 512 lanes (f32 d_x put it 762K over); rounding is of
        # the same order as the bf16 flax backward's own matmul rounding
        + [jax.ShapeDtypeStruct((v, 128, n), jnp.bfloat16),    # d_x
           jax.ShapeDtypeStruct((v, 8, n), jnp.float32),       # d_vis
           jax.ShapeDtypeStruct((3, n), jnp.float32),          # d_pp
           jax.ShapeDtypeStruct((27, n), jnp.float32)])        # d_dirpe
    r_out_specs = (
        [pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                      memory_space=pltpu.VMEM) for w in ws_ray]
        + [_lane3(v, 128), _lane3(v, 8), _lane2(3), _lane2(27)])
    r_outs = pl.pallas_call(
        ray_kernel,
        grid=(n // n_t_bwd,),
        in_specs=[
            _lane2(3),                                         # pp
            _lane2(27),                                        # dirpe
            pl.BlockSpec((128, n_t_bwd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),             # posenc
            _lane3(v, 128),                                    # x residual
            _lane3(v, 8),                                      # vis/mask
            _lane2(4),                                         # cotangent
        ] + _full_spec(ws_ray),
        out_specs=r_out_specs,
        out_shape=r_out_shapes,
        interpret=interpret,
    )(pp, dirpe, pe_b, xres, visres, cot, *ws_ray)
    d_ws_ray = r_outs[:24]
    d_x, d_vis, d_pp, d_dirpe = r_outs[24:]

    trunk_kernel = functools.partial(
        pallas_agg_bwd.dynamic_bwd_trunk_kernel, n_views=v, feat_ch=f,
        interpret=interpret)
    t_out_shapes = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_trunk]
        + [jax.ShapeDtypeStruct((v, f + 4, n), jnp.float32),   # d_pv
           jax.ShapeDtypeStruct((cf, n), jnp.float32)])        # d_dirfeat
    t_out_specs = (
        [pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                      memory_space=pltpu.VMEM) for w in ws_trunk]
        + [_lane3(v, f + 4), _lane2(cf)])
    t_outs = pl.pallas_call(
        trunk_kernel,
        grid=(n // n_t_bwd,),
        in_specs=[
            _lane2(cf),                                        # dirfeat
            _lane3(v, f + 4),                                  # pv
            _lane3(v, 128),                                    # d_x
            _lane3(v, 8),                                      # d_vis
        ] + _full_spec(ws_trunk),
        out_specs=t_out_specs,
        out_shape=t_out_shapes,
        scratch_shapes=[
            pltpu.VMEM((v, cf, n_t_bwd), jnp.float32),         # d_rf stash
        ],
        interpret=interpret,
    )(dirfeat, pv, d_x, d_vis, *ws_trunk)
    d_ws_trunk = t_outs[:12]
    d_pv, d_dirfeat = t_outs[12:]

    d_ws = tuple(g.astype(w.dtype)
                 for g, w in zip(tuple(d_ws_trunk) + tuple(d_ws_ray), ws))
    return (d_ws, d_pp, d_dirfeat.astype(dirfeat.dtype),
            d_dirpe.astype(dirpe.dtype), jnp.zeros_like(pe),
            d_pv.astype(pv.dtype))

  core.defvjp(core_fwd, core_bwd)
  return core


def fused_dynamic_aggregator(p: Dict[str, Any], pts, rgb_feat, glb_ray_dir,
                             ray_diff, time_diff, mask, time, *,
                             shift: float = 0.0, n_samples: int = 64,
                             interpret: bool = False,
                             pallas_bwd: bool = False,
                             pv_cm=None, shape=None) -> jnp.ndarray:
  """Drop-in fused forward of models.aggregators.DynamicAggregator.

  Same array arguments as the flax module's __call__ (ray_diff/time_diff
  accepted for parity; the reference forward never reads them); returns
  raw [R,S,4].  pallas_bwd=True makes it differentiable via the
  hand-written single-kernel backward; pallas_bwd="split" via the
  two-kernel ray/trunk split backward (both in ops/pallas_agg_bwd.py).

  pv_cm: optional pre-packed per-view input [V, f+4, N] (channels:
  rgb_feat then mask) in the kernel's native feature-major layout —
  the layout-stable handoff from the channel-major sampler
  (core/projection.compute_with_motions_cm).  With it, rgb_feat/mask may
  be None and `shape`=(r, s, v, 3+f) supplies the dimensions.
  """
  del ray_diff, time_diff
  from dynibar_tpu.core.posenc import periodic_embed
  if pv_cm is not None:
    assert not pallas_bwd, "pv_cm is an eval-path (forward-only) handoff"
    r, s, v, cfull = shape
  else:
    r, s, v, cfull = rgb_feat.shape
  f = cfull - 3
  if pallas_bwd == "split":
    diff_target = _N_TARGET_SPLIT_FWD
  elif pallas_bwd:
    diff_target = _N_TARGET_DIFF
  else:
    diff_target = 0
  g, r_pad, n_t = _tile_layout(r, s, diff_target, v=v)
  n = (r + r_pad) * s

  # direction (time) feature: MLP(broadcast(t)) == broadcast(MLP(t)) — run
  # on [R,S,·] outside, feed per-point (reference mlp_network.py:240-247)
  time_pe = periodic_embed(time, max_freq=10, n_freq=10,
                           linspace=False).astype(jnp.bfloat16)
  rdw = p["ray_dir_fc"]
  h = _elu(time_pe @ rdw["dense_0"]["kernel"].astype(jnp.bfloat16)
                 + rdw["dense_0"]["bias"].astype(jnp.bfloat16))
  dirfeat = _elu(h @ rdw["dense_1"]["kernel"].astype(jnp.bfloat16)
                       + rdw["dense_1"]["bias"].astype(jnp.bfloat16))
  dirfeat = _point_major(dirfeat, r_pad)                        # [35,N]

  dir_pe = periodic_embed(glb_ray_dir, max_freq=4, n_freq=4,
                          linspace=False).astype(jnp.bfloat16)  # [R,27]
  dir_pe = jnp.broadcast_to(dir_pe[:, None, :], (r, s, dir_pe.shape[-1]))
  dirpe = _point_major(dir_pe, r_pad)

  pe_tile = jnp.asarray(sample_axis_posenc(128, n_samples)[:s].T)
  pe_tile = jnp.tile(pe_tile, (1, n_t // s))                    # [128,n_t]

  if pv_cm is not None:
    pv = pv_cm.astype(jnp.bfloat16)
    if r_pad:
      # trailing-axis pad: contiguous, layout-preserving (padded rays are
      # zeros -> mask 0, same as _to_feature_major's row padding)
      pv = jnp.pad(pv, ((0, 0), (0, 0), (0, r_pad * s)))
  else:
    pv = jnp.concatenate([rgb_feat.astype(jnp.bfloat16),
                          mask.astype(jnp.bfloat16)], axis=-1)
    pv = _to_feature_major(pv, r_pad)                           # [V,f+4,N]
  pp = _point_major(pts.astype(jnp.float32), r_pad)

  ws = (_pooling_ws(p) + _attn_ws(p) + _mlp_ws(p, "ref_pts_fc")
        + _mlp_ws(p, "out_geometry_fc") + _mlp3_ws(p, "rgb_fc"))

  if not pallas_bwd:
    kernel = functools.partial(
        _dynamic_kernel, n_views=v, feat_ch=f, s_block=s, shift=shift,
        interpret=interpret)
    in_specs = [
        pl.BlockSpec((3, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((f + 3, n_t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, n_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((128, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((v, f + 4, n_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ] + _full_spec(ws)

    out = pl.pallas_call(
        kernel,
        grid=(n // n_t,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, n_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((v, f + 3, n_t), jnp.bfloat16),     # rf
            pltpu.VMEM((v, 128, n_t), jnp.bfloat16),       # x
            pltpu.VMEM((v, 8, n_t), jnp.float32),          # vis(0)/mask(1)
            pltpu.VMEM((v, 8, n_t), jnp.float32),          # w2
        ],
        interpret=interpret,
    )(pp, dirfeat, dirpe, pe_tile, pv, *ws)
  elif pallas_bwd == "split":
    n_t_bwd = _split_bwd_tile(n, s, v, min(_N_TARGET_SPLIT_BWD, n_t))
    out = _make_dyn_core_diff_split(v, f, s, shift, n_t, n_t_bwd, n,
                                    interpret)(
        tuple(ws), pp, dirfeat, dirpe, pe_tile, pv)
  else:
    out = _make_dyn_core_diff(v, f, s, shift, n_t, n, interpret)(
        tuple(ws), pp, dirfeat, dirpe, pe_tile, pv)

  raw = out.reshape(4, r + r_pad, s)[:, :r]
  return jnp.transpose(raw, (1, 2, 0))
