"""Bit-level parity of the Flax networks vs torch replicas of the reference
architectures, through the checkpoint converter.

Strategy: build each reference network in torch (same layer graph as
ibrnet/mlp_network.py + feature_network.py), run a forward pass on random
inputs, convert its state_dict with dynibar_tpu.utils.torch_convert, run the
Flax module, compare.  This pins down the subtle semantics SURVEY.md §7
flags as checkpoint-parity hazards: InstanceNorm/reflect-pad, ELU ordering,
the ray transformer's query-row masking, mask_rgb black-pixel masking, the
softmax -1e9 fills, and the torch->flax weight layout mapping.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from dynibar_tpu.models.aggregators import DynamicAggregator, StaticAggregator
from dynibar_tpu.models.feature_net import FeatureNet
from dynibar_tpu.models.motion_mlp import MotionMLP
from dynibar_tpu.utils import torch_convert as tc

torch.manual_seed(0)


# ---------------------------------------------------------------- helpers

def _pe_torch(x, n_freq, linspace):
  """Reference PeriodicEmbed semantics."""
  if linspace:
    freqs = torch.linspace(1, n_freq + 1, steps=n_freq)
  else:
    freqs = 2 ** torch.linspace(0, n_freq - 1, steps=n_freq)
  out = [x]
  for fn in (torch.cos, torch.sin):
    for f in freqs:
      out.append(fn(f * x))
  return torch.cat(out, -1)


def _sample_posenc_torch(d_hid, n):
  pos = np.arange(n)[:, None]
  hid = np.arange(d_hid)[None, :]
  ang = pos / np.power(10000.0, 2 * (hid // 2) / d_hid)
  tab = np.zeros((n, d_hid))
  tab[:, 0::2] = np.sin(ang[:, 0::2])
  tab[:, 1::2] = np.cos(ang[:, 1::2])
  return torch.from_numpy(tab).float()[None]


class TorchAttention(tnn.Module):
  """Reference MultiHeadAttention (mlp_network.py:56-104)."""

  def __init__(self, n_head=4, d_model=128, d_k=32, d_v=32):
    super().__init__()
    self.n_head, self.d_k, self.d_v = n_head, d_k, d_v
    self.w_qs = tnn.Linear(d_model, n_head * d_k, bias=False)
    self.w_ks = tnn.Linear(d_model, n_head * d_k, bias=False)
    self.w_vs = tnn.Linear(d_model, n_head * d_v, bias=False)
    self.fc = tnn.Linear(n_head * d_v, d_model, bias=False)
    self.layer_norm = tnn.LayerNorm(d_model, eps=1e-6)

  def forward(self, q, k, v, mask=None):
    b, lq = q.shape[0], q.shape[1]
    res = q
    qh = self.w_qs(q).view(b, lq, self.n_head, self.d_k).transpose(1, 2)
    kh = self.w_ks(k).view(b, -1, self.n_head, self.d_k).transpose(1, 2)
    vh = self.w_vs(v).view(b, -1, self.n_head, self.d_v).transpose(1, 2)
    attn = torch.matmul(qh / self.d_k ** 0.5, kh.transpose(2, 3))
    if mask is not None:
      attn = attn.masked_fill(mask.unsqueeze(1) == 0, -1e9)
    attn = tF.softmax(attn, dim=-1)
    out = torch.matmul(attn, vh).transpose(1, 2).reshape(b, lq, -1)
    return self.layer_norm(self.fc(out) + res)


def _mean_var(x, w):
  mean = torch.sum(x * w, dim=2, keepdim=True)
  var = torch.sum(w * (x - mean) ** 2, dim=2, keepdim=True)
  return mean, var


class TorchVisTrunk(tnn.Module):
  """base_fc -> vis gating -> geometry_fc trunk shared by both aggregators."""

  def __init__(self, feat):
    super().__init__()
    elu = tnn.ELU(inplace=True)
    self.base_fc = tnn.Sequential(tnn.Linear(feat * 3, 256), elu,
                                  tnn.Linear(256, 128), elu)
    self.vis_fc = tnn.Sequential(tnn.Linear(128, 128), elu,
                                 tnn.Linear(128, 129), elu)
    self.vis_fc2 = tnn.Sequential(tnn.Linear(128, 128), elu,
                                  tnn.Linear(128, 1), tnn.Sigmoid())
    self.geometry_fc = tnn.Sequential(tnn.Linear(257, 256), elu,
                                      tnn.Linear(256, 128), elu)

  def forward(self, rgb_feat, weight, mask):
    nv = rgb_feat.shape[2]
    mean, var = _mean_var(rgb_feat, weight)
    glob = torch.cat([mean, var], dim=-1)
    x = torch.cat([glob.expand(-1, -1, nv, -1), rgb_feat], dim=-1)
    x = self.base_fc(x)
    xv = self.vis_fc(x * weight)
    x_res, vis = torch.split(xv, [128, 1], dim=-1)
    vis = torch.sigmoid(vis) * mask
    x = x + x_res
    vis = self.vis_fc2(x * vis) * mask
    weight = vis / (torch.sum(vis, dim=2, keepdim=True) + 1e-8)
    mean, var = _mean_var(x, weight)
    glob = torch.cat([mean.squeeze(2), var.squeeze(2),
                      weight.mean(dim=2)], dim=-1)
    return x, vis, self.geometry_fc(glob), weight


class TorchDynamic(tnn.Module):
  """Reference DynibarDynamic (mlp_network.py:129-316), shift + no AA pool."""

  def __init__(self, in_feat=32, n_samples=16, shift=5.0):
    super().__init__()
    elu = tnn.ELU(inplace=True)
    self.shift = shift
    self.n_samples = n_samples
    self.ray_dir_fc = tnn.Sequential(tnn.Linear(21, 256), elu,
                                     tnn.Linear(256, in_feat + 3), elu)
    self.trunk = TorchVisTrunk(in_feat + 3)
    self.ray_attention = TorchAttention()
    self.ref_pts_fc = tnn.Sequential(tnn.Linear(33 + 128, 256), elu,
                                     tnn.Linear(256, 128), elu)
    self.out_geometry_fc = tnn.Sequential(tnn.Linear(128, 128), elu,
                                          tnn.Linear(128, 1))
    self.rgb_fc = tnn.Sequential(tnn.Linear(128 + 27, 128), elu,
                                 tnn.Linear(128, 64), elu,
                                 tnn.Linear(64, 3), tnn.Sigmoid())
    self.pos_enc = _sample_posenc_torch(128, n_samples)

  def forward(self, pts, rgb_feat, ray_dir, ray_diff, mask, time):
    nv = rgb_feat.shape[2]
    tpe = _pe_torch(time, 10, False)[..., None, :].repeat(1, 1, nv, 1)
    rgb_feat = rgb_feat + self.ray_dir_fc(tpe)
    weight = mask / (torch.sum(mask, dim=2, keepdim=True) + 1e-8)
    x, vis, glob, weight = self.trunk(rgb_feat, weight, mask)
    nvo = torch.sum(mask, dim=2)
    glob = glob + self.pos_enc
    glob = self.ray_attention(glob, glob, glob, mask=(nvo > 1).float())
    glob = self.ref_pts_fc(torch.cat([glob, _pe_torch(pts, 5, False)], -1))
    sigma = self.out_geometry_fc(glob) - self.shift
    sigma = sigma.masked_fill(nvo < 1, -1e9)
    dpe = _pe_torch(ray_dir, 4, False)
    h = torch.cat([glob, dpe[:, None, :].repeat(1, glob.shape[1], 1)], -1)
    rgb = self.rgb_fc(h)
    rgb = rgb.masked_fill(torch.sum(mask.repeat(1, 1, 1, 3), 2) == 0, 0)
    return torch.cat([rgb, sigma], dim=-1)


class TorchStatic(tnn.Module):
  """Reference DynibarStatic (mlp_network.py:319-527) w/ AA pool + mask_rgb."""

  def __init__(self, in_feat=32, n_samples=16):
    super().__init__()
    elu = tnn.ELU(inplace=True)
    self.s = tnn.Parameter(torch.tensor(0.2))
    self.ray_dir_fc = tnn.Sequential(tnn.Linear(4 + 33 + 66, 256), elu,
                                     tnn.Linear(256, in_feat + 3))
    self.ref_feature_fc = tnn.Sequential(tnn.Linear(66, in_feat + 3))
    self.trunk = TorchVisTrunk((in_feat + 3) * 2)
    self.ray_attention = TorchAttention()
    self.out_geometry_fc = tnn.Sequential(tnn.Linear(128, 128), elu,
                                          tnn.Linear(128, 1))
    self.rgb_fc = tnn.Sequential(tnn.Linear(128 * 2 + 1 + 4, 128), elu,
                                 tnn.Linear(128, 64), elu, tnn.Linear(64, 1))

  def forward(self, pts, ref_pl, src_pl, rgb_feat, ray_diff, mask):
    nv = rgb_feat.shape[2]
    ref_pe = _pe_torch(ref_pl, 5, False)
    src_pe = _pe_torch(src_pl, 5, False)
    pts_pe = _pe_torch(pts, 5, False)
    ref_features = ref_pe[:, None, None, :].expand(-1, src_pe.shape[1],
                                                   src_pe.shape[2], -1)
    src_features = torch.cat(
        [pts_pe.unsqueeze(2).expand(-1, -1, nv, -1), src_pe], dim=-1)
    src_feat = self.ray_dir_fc(torch.cat([src_features, ray_diff], -1))
    ref_feat = self.ref_feature_fc(ref_features)
    rgb_in = rgb_feat[..., :3]
    rgb_mask = (rgb_in.sum(-1, keepdim=True) > 1e-3).float().detach()
    mask = mask * rgb_mask
    rgb_feat = torch.cat([rgb_feat, src_feat * ref_feat], -1)
    dot = ray_diff[..., 3:]
    expd = torch.exp(torch.abs(self.s) * (dot - 1))
    weight = (expd - expd.min(dim=2, keepdim=True)[0]) * mask
    weight = weight / (weight.sum(dim=2, keepdim=True) + 1e-8)
    x, vis, glob, weight = self.trunk(rgb_feat, weight, mask)
    nvo = torch.sum(mask, dim=2)
    glob = self.ray_attention(glob, glob, glob, mask=(nvo > 1).float())
    sigma = self.out_geometry_fc(glob).masked_fill(nvo < 1, -1e9)
    h = torch.cat([glob[:, :, None, :].expand(-1, -1, nv, -1), x, vis,
                   ray_diff], -1)
    logits = self.rgb_fc(h).masked_fill(mask == 0, -1e9)
    blend = tF.softmax(logits, dim=2)
    rgb = torch.sum(rgb_in * blend, dim=2)
    return torch.cat([rgb, sigma], dim=-1)


def _flatten_torch_sd(module, renames):
  """state_dict with key renames applied (trunk.* -> reference names)."""
  sd = {}
  for k, v in module.state_dict().items():
    for old, new in renames.items():
      if k.startswith(old):
        k = new + k[len(old):]
        break
    sd[k] = v
  return sd


TRUNK_RENAMES = {"trunk.base_fc": "base_fc", "trunk.vis_fc2": "vis_fc2",
                 "trunk.vis_fc": "vis_fc", "trunk.geometry_fc": "geometry_fc"}


# ------------------------------------------------------------------ tests

def test_dynamic_aggregator_parity():
  r, s, v, feat = 3, 16, 5, 32
  rng = np.random.RandomState(0)
  pts = rng.randn(r, s, 3).astype(np.float32)
  rgb_feat = rng.rand(r, s, v, feat + 3).astype(np.float32)
  ray_dir = rng.randn(r, 3).astype(np.float32)
  ray_diff = rng.randn(r, s, v, 4).astype(np.float32)
  mask = (rng.rand(r, s, v, 1) > 0.3).astype(np.float32)
  time = np.full((r, s, 1), 0.37, np.float32)

  tmodel = TorchDynamic(in_feat=feat, n_samples=s, shift=5.0).eval()
  with torch.no_grad():
    want = tmodel(*(torch.from_numpy(a) for a in
                    (pts, rgb_feat, ray_dir, ray_diff, mask, time))).numpy()

  sd = {k: v.numpy() for k, v in
        _flatten_torch_sd(tmodel, TRUNK_RENAMES).items()}
  params = tc.convert_dynamic_aggregator(sd)
  fmodel = DynamicAggregator(in_feat_ch=feat, n_samples=s, shift=5.0)
  got = fmodel.apply({"params": params}, jnp.asarray(pts),
                     jnp.asarray(rgb_feat), jnp.asarray(ray_dir),
                     jnp.asarray(ray_diff), jnp.zeros((r, s, v, 1)),
                     jnp.asarray(mask), jnp.asarray(time))
  got = np.asarray(got)
  np.testing.assert_allclose(got[..., :3], want[..., :3], atol=2e-5)
  np.testing.assert_allclose(got[..., 3], want[..., 3], atol=2e-4,
                             rtol=1e-4)


def test_static_aggregator_parity():
  r, s, v, feat = 3, 16, 5, 32
  rng = np.random.RandomState(1)
  pts = rng.randn(r, s, 3).astype(np.float32)
  ref_pl = rng.randn(r, 6).astype(np.float32)
  src_pl = rng.randn(r, s, v, 6).astype(np.float32)
  rgb_feat = rng.rand(r, s, v, feat + 3).astype(np.float32)
  # include some "black" source pixels to exercise mask_rgb
  rgb_feat[0, :4, 0, :3] = 0.0
  ray_diff = rng.randn(r, s, v, 4).astype(np.float32)
  mask = (rng.rand(r, s, v, 1) > 0.3).astype(np.float32)

  tmodel = TorchStatic(in_feat=feat, n_samples=s).eval()
  with torch.no_grad():
    want = tmodel(*(torch.from_numpy(a) for a in
                    (pts, ref_pl, src_pl, rgb_feat, ray_diff,
                     mask))).numpy()

  sd = {k: v.numpy() for k, v in
        _flatten_torch_sd(tmodel, TRUNK_RENAMES).items()}
  # reference stores ref_feature_fc as Sequential index 0
  sd["ref_feature_fc.0.weight"] = sd.pop("ref_feature_fc.0.weight") \
      if "ref_feature_fc.0.weight" in sd else sd.pop("ref_feature_fc.weight")
  params = tc.convert_static_aggregator(sd)
  fmodel = StaticAggregator(in_feat_ch=feat, n_samples=s,
                            anti_alias_pooling=True, mask_rgb=True)
  got = fmodel.apply({"params": params}, jnp.asarray(pts),
                     jnp.asarray(ref_pl), jnp.asarray(src_pl),
                     jnp.asarray(rgb_feat), jnp.asarray(np.zeros((r, 3))),
                     jnp.asarray(ray_diff), jnp.asarray(mask))
  got = np.asarray(got)
  np.testing.assert_allclose(got[..., :3], want[..., :3], atol=2e-5)
  np.testing.assert_allclose(got[..., 3], want[..., 3], atol=2e-4,
                             rtol=1e-4)


def test_motion_mlp_parity():
  class TorchMotion(tnn.Module):
    def __init__(self, num_basis=6, d=8, w=256, num_freqs=16):
      super().__init__()
      in_ch = 4 + 4 * num_freqs * 2
      self.in_ch = in_ch
      layers = [tnn.Linear(in_ch, w)]
      for i in range(d - 1):
        layers.append(tnn.Linear(w + in_ch, w) if i == 4
                      else tnn.Linear(w, w))
      self.pts_linears = tnn.ModuleList(layers)
      self.coeff_linear = tnn.Linear(w, num_basis * 3)
      self.coeff_linear.weight.data.fill_(0.01)
      self.coeff_linear.bias.data.fill_(0.02)
      self.num_freqs = num_freqs

    def forward(self, x):
      inp = _pe_torch(x, self.num_freqs, True)
      h = inp
      for i, layer in enumerate(self.pts_linears):
        h = tF.relu(layer(h))
        if i == 4:
          h = torch.cat([inp, h], -1)
      return self.coeff_linear(h)

  rng = np.random.RandomState(2)
  x = rng.randn(7, 4).astype(np.float32)
  tmodel = TorchMotion().eval()
  with torch.no_grad():
    want = tmodel(torch.from_numpy(x)).numpy()
  sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
  params = tc.convert_motion_mlp(sd)
  got = np.asarray(MotionMLP(num_basis=6).apply({"params": params},
                                                jnp.asarray(x)))
  np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_feature_net_parity():
  class TorchBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
      super().__init__()
      self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False,
                              padding_mode="reflect")
      self.bn1 = tnn.InstanceNorm2d(cout, affine=True,
                                    track_running_stats=False)
      self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False,
                              padding_mode="reflect")
      self.bn2 = tnn.InstanceNorm2d(cout, affine=True,
                                    track_running_stats=False)
      self.down = None
      if stride != 1 or cin != cout:
        self.down = tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, stride, bias=False),
            tnn.InstanceNorm2d(cout, affine=True,
                               track_running_stats=False))

    def forward(self, x):
      idt = self.down(x) if self.down is not None else x
      out = tF.relu(self.bn1(self.conv1(x)))
      out = self.bn2(self.conv2(out))
      return tF.relu(out + idt)

  class TorchFeat(tnn.Module):
    def __init__(self, cc=8, cf=8):
      super().__init__()
      self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False,
                              padding_mode="reflect")
      self.bn1 = tnn.InstanceNorm2d(64, affine=True,
                                    track_running_stats=False)
      self.layer1 = tnn.Sequential(TorchBlock(64, 64, 2),
                                   TorchBlock(64, 64, 1),
                                   TorchBlock(64, 64, 1))
      self.out_conv = tnn.Conv2d(64, cc + cf, 1, 1)
      self.cc, self.cf = cc, cf

    def forward(self, x):
      x = tF.relu(self.bn1(self.conv1(x)))
      x = self.out_conv(self.layer1(x))
      return x[:, :self.cc], x[:, -self.cf:]

  # init affine norms away from identity so the test is meaningful
  tmodel = TorchFeat().eval()
  for m in tmodel.modules():
    if isinstance(m, tnn.InstanceNorm2d):
      tnn.init.normal_(m.weight, 1.0, 0.1)
      tnn.init.normal_(m.bias, 0.0, 0.1)

  rng = np.random.RandomState(3)
  img = rng.rand(2, 40, 56, 3).astype(np.float32)
  with torch.no_grad():
    wc, wf = tmodel(torch.from_numpy(img).permute(0, 3, 1, 2))
  want_c = wc.permute(0, 2, 3, 1).numpy()
  want_f = wf.permute(0, 2, 3, 1).numpy()

  # rename torch keys to reference layout (layer1.{i}., downsample.{0,1}.)
  sd = {}
  for k, v in tmodel.state_dict().items():
    k = k.replace("down.0.", "downsample.0.").replace("down.1.",
                                                      "downsample.1.")
    sd[k] = v.numpy()
  params = tc.convert_feature_net(sd)
  got_c, got_f = FeatureNet(8, 8).apply({"params": params},
                                        jnp.asarray(img))
  np.testing.assert_allclose(np.asarray(got_c), want_c, atol=3e-4,
                             rtol=1e-3)
  np.testing.assert_allclose(np.asarray(got_f), want_f, atol=3e-4,
                             rtol=1e-3)
