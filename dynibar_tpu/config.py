"""Configuration system.

Feature-parity rebuild of the reference flag set (reference: config.py:6-375)
as typed dataclasses, plus a reader for the reference's configargparse-style
``key = value`` config ``.txt`` files (``configs/*.txt``, ``configs_nvidia/*.txt``)
so existing experiment configs keep working.

Two layers:
  * :class:`DynibarConfig` — every user-facing knob of the reference.
  * :class:`RenderSettings` — the *static* (compile-time) subset the jitted
    render core closes over: sample counts, padded view counts, flags that
    select program structure.  Keeping these in a hashable frozen dataclass
    makes them safe to pass as static args to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence


def _parse_value(field_type, raw: str):
  raw = raw.strip()
  if field_type is bool:
    return raw.lower() in ("1", "true", "yes", "on")
  if field_type is int:
    return int(raw)
  if field_type is float:
    return float(raw)
  if field_type in (List[str], list):
    return raw.split()
  return raw


@dataclasses.dataclass
class DynibarConfig:
  """All knobs of the system (mirrors reference config.py:6-375)."""

  # general / paths
  config: Optional[str] = None
  rootdir: str = "./"
  folder_path: str = ""
  coarse_dir: str = ""
  expname: str = "exp"
  distributed: bool = False
  local_rank: int = 0
  workers: int = 4

  # data / masking options
  mask_src_view: bool = False
  mask_static: bool = False
  training_height: int = 288
  erosion_radius: int = 1

  # ray/batch options
  N_rand: int = 512
  sample_mode: str = "uniform"
  chunk_size: int = 1024

  # model options
  coarse_feat_dim: int = 32
  fine_feat_dim: int = 32
  num_source_views: int = 7
  num_basis: int = 6
  anti_alias_pooling: int = 1
  mask_rgb: int = 1
  num_vv: int = 3
  lr_multipler: float = 1.0

  # curriculum / schedules
  init_decay_epoch: int = 150
  max_range: int = 35
  decay_rate: float = 10.0
  cycle_factor: float = 0.1
  anneal_cycle: bool = False

  # datasets
  eval_dataset: str = "llff_test"
  eval_scenes: List[str] = dataclasses.field(default_factory=list)
  train_dataset: str = "monocular"
  train_scenes: List[str] = dataclasses.field(default_factory=list)
  render_idx: int = -1

  # checkpoints
  no_reload: bool = False
  ckpt_path: str = ""
  no_load_opt: bool = False
  no_load_scheduler: bool = False
  pretrain_path: str = ""

  # iterations & learning rates
  n_iters: int = 300000
  lrate_feature: float = 1e-3
  lrate_mlp: float = 5e-4
  lrate_decay_factor: float = 0.5
  lrate_decay_steps: int = 50000
  # Global-norm gradient clip (0 = off, matching the reference, which never
  # clips).  Compressed schedules (convergence overfits, small synthetic
  # scenes) can hit sudden trajectory-basis blowups that the reference's
  # 300k-step horizon never reaches; this is the run-level guard for those.
  clip_grad_norm: float = 0.0

  # loss weights
  w_cycle: float = 0.1
  w_distortion: float = 1e-3
  w_entropy: float = 0.0
  w_disp: float = 5e-2
  w_flow: float = 5e-3
  w_skew_entropy: float = 1e-3
  w_reg: float = 0.05
  occ_weights_mode: int = 0

  # rendering options
  N_samples: int = 64
  N_importance: int = 64
  inv_uniform: bool = False
  input_dir: bool = False
  input_xyz: bool = False
  det: bool = False
  white_bkgd: bool = False
  render_stride: int = 1

  # logging
  i_print: int = 100
  i_img: int = 1000
  i_weights: int = 10000

  # derived at runtime (reference train.py:91-92)
  num_frames: int = 0

  # TPU-specific additions (no reference analog)
  mesh_shape: str = "auto"        # e.g. "8" or "auto"
  compute_dtype: str = "float32"  # "bfloat16" for the aggregation MLPs
  donate_buffers: bool = True
  use_remat: bool = True          # rematerialize nets in backward (training)
  # speed mode: sample source RGB from the 1/4-res feature maps instead of
  # full-res images — halves the (dominant) gather cost; deviates from the
  # reference's full-res RGB lookup. Off by default.
  fused_rgb_sampling: bool = False
  # speed mode: epipolar-strip feature sampling for eval/render (one strip
  # gather per (ray, view) + MXU interpolation, ops/strip_sample.py);
  # training always keeps the per-sample gather. Off by default.
  strip_sampling: bool = False
  strip_rows: int = 16
  strip_cols: int = 64
  strip_impl: str = "pallas"
  strip_auto_exact: bool = True
  # NOTE a former `strip_train` mode (Pallas sampler in the TRAINING
  # forward + scanline-coherent `coherent_ray_segment` batches) was
  # REMOVED in round 4 after failing convergence at the matched protocol:
  # the window silently censors exactly the samples carrying the largest
  # motion-field restoring gradients (measured 430 vs 2.2 |g_motion| at
  # the divergence onset) and coherent rays alone cost ~10 dB at 3k steps
  # (+2.9 vs +12.6 novel-view rise).  Full post-mortem: DESIGN.md §3,
  # CONVERGENCE.md.  Training always uses the exact gather + custom VJP.
  # fused Pallas aggregator kernels for eval/render (ops/pallas_agg.py).
  # Only takes effect with compute_dtype="bfloat16" and when the caller
  # does not differentiate through the render (_agg_fns gates on gradient
  # need — gradient-bearing steps, incl. the phase-1 bootstrap, get a
  # differentiable path), so it is safe to default on.
  fused_aggregators: bool = True
  # training too: Pallas primal forward + chunked flax-derived backward
  # (identical gradients; measured 1.22 -> 0.93 s/step).  Like
  # fused_aggregators, only takes effect in bf16 mode.
  fused_aggregators_train: bool = True
  # backward implementation for the DYNAMIC aggregator when training with
  # fused_aggregators_train: "flax" (chunked flax vjp), "pallas"
  # (hand-written single-kernel backward) or "pallas_split" (two-kernel
  # ray/trunk split backward; both in ops/pallas_agg_bwd.py).  Measured at
  # the reference mono shape (V=9/10): split 39/41 ms per fwd+bwd call vs
  # 67/72 ms chunked flax -> default on.
  fused_bwd_impl: str = "pallas_split"
  # layout-stable sampler->aggregator handoff for eval/render (see
  # RenderSettings.fused_handoff)
  fused_handoff: bool = True
  # backward for the STATIC aggregator: "flax" or "pallas_split".  The
  # V=14 trunk kernel only fits the 16 MB scoped-vmem limit at a 128-lane
  # tile, but still beats the chunked flax backward in the full step:
  # 725 vs 821 ms/step (with the dynamic split + corner-folded sampler
  # backward) -> default on.
  fused_st_bwd_impl: str = "pallas_split"
  # cli/render_monocular: also assemble the rendered frames into an mp4
  # ("auto" = <out_dir>/video.mp4, "" = PNG frames only, like the reference)
  video_out: str = "auto"
  video_fps: float = 24.0

  @classmethod
  def from_file(cls, path: str, **overrides) -> "DynibarConfig":
    """Read a reference-style ``key = value`` config file."""
    values = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    with open(path) as fh:
      for line in fh:
        line = line.split("#", 1)[0].strip()
        if not line or "=" not in line:
          # configargparse also supports bare flags ("inv_uniform")
          key = line.strip()
          if key in fields and fields[key].type in ("bool", bool):
            values[key] = True
          continue
        key, raw = (tok.strip() for tok in line.split("=", 1))
        if key not in fields:
          continue
        ftype = fields[key].type
        if isinstance(ftype, str):
          ftype = {"bool": bool, "int": int, "float": float, "str": str,
                   "List[str]": List[str], "Optional[str]": str}.get(ftype, str)
        values[key] = _parse_value(ftype, raw)
    values.update(overrides)
    return cls(**values)

  def experiment_name(self) -> str:
    """Auto-embed hyperparams in expname (reference train.py:50-57)."""
    return (
        f"{self.expname}_mr-{self.max_range}"
        f"_w-disp-{self.w_disp:.3f}_w-flow-{self.w_flow:.3f}"
        f"_anneal_cycle-{self.w_cycle:.1f}-{self.cycle_factor:.1f}"
        f"-w_mode-{self.occ_weights_mode}"
    )

  def out_folder(self) -> str:
    return os.path.join(self.rootdir, "out", self.experiment_name())

  def render_settings(self, mode: str = "mono") -> "RenderSettings":
    if mode == "mono":
      num_dy = 6 + self.num_vv
      num_anchor = 7 + self.num_vv  # <=6 real + occasional identity + vv
      num_static = 2 * self.num_source_views
    elif mode == "ff_train":  # fine-stage FF training (cross-time branch on)
      num_dy = 7
      num_anchor = 6
      num_static = 11
    else:  # forward-facing Nvidia benchmark eval
      num_dy = 7
      num_anchor = 0
      num_static = 11
    return RenderSettings(
        n_samples=self.N_samples,
        n_importance=self.N_importance if mode != "mono" else 0,
        num_views_dy=num_dy,
        num_views_anchor=num_anchor,
        num_views_static=num_static,
        num_vv=self.num_vv if mode == "mono" else 0,
        num_basis=self.num_basis,
        inv_uniform=self.inv_uniform,
        occ_weights_mode=self.occ_weights_mode,
        anti_alias_pooling=bool(self.anti_alias_pooling),
        mask_rgb=bool(self.mask_rgb),
        coarse_feat_dim=self.coarse_feat_dim,
        fine_feat_dim=self.fine_feat_dim,
        mono_time_diff=(mode == "mono"),
        compute_dtype=self.compute_dtype,
        fused_rgb_sampling=self.fused_rgb_sampling,
        strip_sampling=self.strip_sampling,
        strip_rows=self.strip_rows,
        strip_cols=self.strip_cols,
        strip_impl=self.strip_impl,
        strip_auto_exact=self.strip_auto_exact,
        fused_aggregators=self.fused_aggregators,
        fused_aggregators_train=self.fused_aggregators_train,
        fused_bwd_impl=self.fused_bwd_impl,
        fused_st_bwd_impl=self.fused_st_bwd_impl,
        fused_handoff=self.fused_handoff,
    )


@dataclasses.dataclass(frozen=True)
class RenderSettings:
  """Static (compile-time) parameters of the jitted render core.

  Hashable so it can be a `static_argnums` argument of `jax.jit`.
  """

  n_samples: int = 64
  n_importance: int = 0
  num_views_dy: int = 9
  num_views_anchor: int = 10
  num_views_static: int = 14
  num_vv: int = 3
  num_basis: int = 6
  inv_uniform: bool = False
  occ_weights_mode: int = 0
  anti_alias_pooling: bool = True
  mask_rgb: bool = True
  coarse_feat_dim: int = 32
  fine_feat_dim: int = 32
  # mono passes raw frame offsets as time_diff; ff divides by num_frames
  # (reference render_ray.py:1027-1032 vs :742-744)
  mono_time_diff: bool = True
  # trajectory offsets window [-3..3] (reference render_ray.py:971)
  traj_window: int = 3
  # "float32": full-precision matmuls (bit-parity with reference f32);
  # "bfloat16": bf16 activations/weights in the aggregation MLPs — 1-pass
  # MXU + half the HBM traffic; geometry stays f32 either way
  compute_dtype: str = "float32"
  # opt-in speed mode: sample source RGB from the (1/4-res) feature maps
  # instead of the full-res images — halves the gather count (the dominant
  # eval cost) at the price of softer source colors. Deviates from the
  # reference's full-res RGB lookup; off by default.
  fused_rgb_sampling: bool = False
  # opt-in speed mode: epipolar-strip feature sampling (ops/strip_sample.py)
  # — one [strip_rows, strip_cols, C] gather per (ray, view) plus an MXU
  # one-hot interpolation instead of one gather descriptor per sample.
  # Exact for samples whose epipolar segment fits the strip; the rare
  # uncovered samples are masked out of the aggregation (same mechanism as
  # out-of-frustum samples). Off by default; pairs well with
  # fused_rgb_sampling (otherwise the full-res RGB lookup still pays one
  # descriptor per sample).
  strip_sampling: bool = False
  strip_rows: int = 16
  strip_cols: int = 64
  # "pallas": gatherless VMEM-resident kernel (ops/pallas_sample.py,
  # fastest; strip_rows/cols ignored — fixed 32-row window, full width);
  # "xla": pure-XLA strip gather + one-hot matmul (ops/strip_sample.py)
  strip_impl: str = "pallas"
  # full-image rendering re-renders any chunk whose fast-path sampling
  # reports a coverage miss through the exact gather program, making
  # strip_sampling bit-correct end to end (render/render_image.py)
  strip_auto_exact: bool = True
  # fused Pallas aggregator kernels (ops/pallas_agg.py): the whole
  # view-aggregation network (PEs, trunk, ray transformer, heads) runs
  # VMEM-resident per ray tile.  Forward-only — eval/render paths use it;
  # training takes the flax modules (autodiff) unless
  # fused_aggregators_train is also set.  Matmul accumulation is f32, so
  # it sits *closer* to the f32 reference than the flax bf16 path it
  # replaces.
  fused_aggregators: bool = False
  # training too: Pallas primal forward + flax-derived backward
  # (ops/pallas_agg.attach_flax_grad) — gradients identical to the flax
  # path, primal forward faster and lighter on HBM
  fused_aggregators_train: bool = False
  # dynamic-aggregator training backward: "flax", "pallas" or
  # "pallas_split" (see DynibarConfig.fused_bwd_impl)
  fused_bwd_impl: str = "pallas_split"
  # static-aggregator training backward: "flax" or "pallas_split"
  fused_st_bwd_impl: str = "pallas_split"
  # layout-stable sampler->aggregator handoff (eval only): keep the Pallas
  # sampler's native channel-major [V, C, N] output all the way into the
  # fused aggregators' feature-major tiles, skipping the [R,S,V,3+C]
  # transpose/concat round-trips between the two kernels
  # (core/projection.compute_with_motions_cm).  Effective only when the
  # Pallas strip sampler AND fused bf16 aggregators are active and the
  # step carries no gradients.
  fused_handoff: bool = True

  @property
  def num_offsets(self) -> int:
    return 2 * self.traj_window + 1
