"""Convergence experiment: overfit the mono model on an analytic,
multi-view-consistent dynamic 3D scene and measure held-out novel-view PSNR
over training (VERDICT round-2 ask #1: nothing before this ever drove a loss
down for more than a dozen steps).

The scene (data/synthetic_scene.ConsistentScene) has exact GT for any pose
and time, so "novel view" means a camera never seen in training, with exact
pixel ground truth.  The training configuration matches the shipped
production defaults (bf16 + fused Pallas aggregators + remat, N_rand=3072,
64 samples — the same combination bench.py measures).

  python scripts/convergence_run.py                 # ~3k steps on the TPU
  python scripts/convergence_run.py --quick         # tiny CPU smoke (CI)

Writes <outdir>/convergence_<tag>.json + first/last renders as PNG, and
appends a summary row to CONVERGENCE.md at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parse_args():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=3000)
  ap.add_argument("--eval_every", type=int, default=250)
  ap.add_argument("--frames", type=int, default=24)
  ap.add_argument("--height", type=int, default=96)
  ap.add_argument("--width", type=int, default=144)
  ap.add_argument("--n_rand", type=int, default=3072)
  ap.add_argument("--init_decay_epoch", type=int, default=40)
  ap.add_argument("--outdir", type=str, default="/tmp/dynibar_convergence")
  ap.add_argument("--tag", type=str, default="default")
  ap.add_argument("--quick", action="store_true",
                  help="tiny CPU configuration for CI smoke")
  ap.add_argument("--gate_db", type=float, default=8.0,
                  help="required novel-view PSNR rise over init (dB)")
  ap.add_argument("--clip", type=float, default=0.0,
                  help="global-norm gradient clip (0 = off, like the ref)")
  ap.add_argument("--resume", action="store_true",
                  help="resume params+opt from the latest checkpoint in "
                       "<outdir>/ckpt_<tag>")
  return ap.parse_args()


def build(args):
  """Scene + config + dataset (production flags unless --quick)."""
  from dynibar_tpu.config import DynibarConfig
  from dynibar_tpu.data.monocular import MonocularSceneData
  from dynibar_tpu.data.synthetic_scene import ConsistentScene

  if args.quick:
    args.frames, args.height, args.width = 10, 40, 60
    args.steps = min(args.steps, 120)
    args.eval_every = min(args.eval_every, 60)
    args.n_rand = 128
    args.init_decay_epoch = 2

  scene = ConsistentScene(num_frames=args.frames, height=args.height,
                          width=args.width)
  root = os.path.join(
      args.outdir,
      f"scene_{args.frames}x{args.height}x{args.width}")
  name = "consistent"
  if not os.path.exists(os.path.join(root, name, "dense",
                                     "poses_bounds_cvd.npy")):
    os.makedirs(root, exist_ok=True)
    scene.write(root, name)
    print(f"wrote scene to {root}")

  if args.quick:
    config = DynibarConfig(
        folder_path=root, train_scenes=[name], training_height=args.height,
        N_rand=args.n_rand, N_samples=16, N_importance=0,
        num_source_views=4, num_vv=2, num_basis=4, max_range=8,
        init_decay_epoch=args.init_decay_epoch, chunk_size=1024,
        compute_dtype="float32", use_remat=False, fused_aggregators=False,
        workers=2, i_print=10, clip_grad_norm=args.clip)
  else:
    config = DynibarConfig(
        folder_path=root, train_scenes=[name], training_height=args.height,
        N_rand=args.n_rand, N_samples=64, N_importance=0,
        num_source_views=7, num_vv=3, num_basis=6, max_range=24,
        init_decay_epoch=args.init_decay_epoch, chunk_size=4608,
        compute_dtype="bfloat16", use_remat=True, fused_aggregators=True,
        workers=2, i_print=50, clip_grad_norm=args.clip)

  data = MonocularSceneData(config, name)
  config.num_frames = data.num_frames
  config.lrate_decay_steps = config.num_frames * config.init_decay_epoch
  return scene, config, data


def final_camera(scene, data, c2w_disk: np.ndarray) -> np.ndarray:
  """Map a disk-frame OpenCV camera into the loader's (scaled+recentered)
  world via the constant rigid transform M = final @ inv(scaled_disk)."""
  cs = scene.c2w(0).astype(np.float64)
  cs[:3, 3] *= data.scale
  m = data.c2w[0].astype(np.float64) @ np.linalg.inv(cs)
  cq = c2w_disk.astype(np.float64).copy()
  cq[:3, 3] *= data.scale
  return (m @ cq).astype(np.float32)


def make_eval_views(scene):
  mid = scene.num_frames // 2
  views = {"train_view": (scene.c2w(mid), float(mid))}
  for k, (pose, tau) in enumerate(scene.held_out_cameras()):
    views[f"novel_{k}"] = (pose, tau)
  return views


def eval_views(model, params, scene, data, cfg, config, views, outdir=None,
               step=None):
  import jax.numpy as jnp
  from dynibar_tpu.cli.render_monocular import render_batch_template
  from dynibar_tpu.core.cameras import make_camera
  from dynibar_tpu.eval.metrics import masked_psnr
  from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                               render_image_mono)
  h, w = scene.h, scene.w
  rec = {}
  for vname, (c2w_disk, tau) in views.items():
    gt, _, dyn = scene.render(c2w_disk, tau)
    idx = int(round(tau))
    template = render_batch_template(data, idx, config.num_source_views,
                                     config.num_vv, np.random.RandomState(0))
    cam = make_camera(h, w, data.intrinsics[idx],
                      final_camera(scene, data, c2w_disk))
    rb = {k: jnp.asarray(v) for k, v in template.items()}
    rb = full_image_ray_batch(rb, jnp.asarray(cam))
    dy, _ = model.apply_feature(params, rb["src_rgbs"])
    st, _ = model.apply_feature_st(params, rb["static_src_rgbs"])
    ret = render_image_mono(model, params, rb, (dy, None, st), cfg,
                            config.chunk_size, h, w)
    rgb = np.asarray(ret["outputs_coarse_ref"]["rgb"], np.float32)
    rec[f"psnr_{vname}"] = masked_psnr(rgb, gt, np.ones_like(gt))
    # The reference never evaluates IBR borders: render_monocular_bt.py
    # crops 3% per side before writing frames (border rays of an offset
    # camera leave every source view's coverage).  Report the same
    # protocol; the gate consumes this metric.
    ch, cw = max(1, round(0.03 * h)), max(1, round(0.03 * w))
    crop = np.s_[ch:h - ch, cw:w - cw]
    rec[f"psnr_{vname}_crop3"] = masked_psnr(
        rgb[crop], gt[crop], np.ones_like(gt[crop]))
    if dyn.any():
      dyn3 = np.repeat(dyn[..., None].astype(np.float32), 3, axis=-1)
      rec[f"psnr_{vname}_dyn"] = masked_psnr(rgb, gt, dyn3)
    if outdir is not None:
      import imageio.v2 as imageio
      imageio.imwrite(
          os.path.join(outdir, f"{vname}_step{step:06d}.png"),
          (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
      gt_path = os.path.join(outdir, f"{vname}_gt.png")
      if not os.path.exists(gt_path):
        imageio.imwrite(gt_path, (np.clip(gt, 0, 1) * 255).astype(np.uint8))
  return rec


def main():
  args = parse_args()
  os.makedirs(args.outdir, exist_ok=True)
  if args.quick:
    # force CPU even when the environment pins a remote accelerator
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
      os.environ["XLA_FLAGS"] = (
          flags + " --xla_force_host_platform_device_count=8").strip()
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  import jax
  import jax.numpy as jnp
  from dynibar_tpu.data.pipeline import PrefetchPipeline
  from dynibar_tpu.models.dynibar import MonoModel
  from dynibar_tpu.train.losses import schedule_weights
  from dynibar_tpu.train.trainer import create_train_state, make_train_step

  from dynibar_tpu.utils.checkpoints import (latest_checkpoint,
                                             load_checkpoint, save_checkpoint)

  scene, config, data = build(args)
  cfg = config.render_settings("mono")
  model = MonoModel(cfg=cfg, num_frames=data.num_frames,
                    remat=config.use_remat)
  state, tx = create_train_state(model, config, jax.random.PRNGKey(0))
  ckpt_dir = os.path.join(args.outdir, f"ckpt_{args.tag}")
  start_step = 0
  if args.resume:
    latest = latest_checkpoint(ckpt_dir)
    if latest is not None:
      payload = load_checkpoint(
          latest, {"params": state.params, "opt_state": state.opt_state,
                   "step": np.int32(0)})
      state = type(state)(params=payload["params"],
                          opt_state=payload["opt_state"],
                          step=jnp.asarray(payload["step"], jnp.int32))
      start_step = int(payload["step"])
      print(f"resumed from {latest} at step {start_step}")
  bootstrap_step = make_train_step(model, tx, cfg, bootstrap=True,
                                   donate=False)
  full_step = make_train_step(model, tx, cfg, bootstrap=False, donate=False)
  views = make_eval_views(scene)
  imgdir = os.path.join(args.outdir, f"renders_{args.tag}")
  os.makedirs(imgdir, exist_ok=True)

  print(f"[{args.tag}] backend={jax.default_backend()} "
        f"frames={data.num_frames} {scene.h}x{scene.w} "
        f"N_rand={config.N_rand} steps={args.steps}")

  out_path = os.path.join(args.outdir, f"convergence_{args.tag}.json")
  curve = []
  if args.resume and start_step > 0 and os.path.exists(out_path):
    # merge the prior (possibly partial) curve so "rise over init" spans
    # the whole training history, not just the resumed tail — accelerator
    # tunnels do die mid-run
    with open(out_path) as fh:
      prev = json.load(fh)
    curve = [r for r in prev.get("curve", [])
             if r.get("step", 0) <= start_step]
    if curve:
      print(f"merged {len(curve)} prior eval points from {out_path}")
  if not curve:
    rec0 = eval_views(model, params=state.params, scene=scene, data=data,
                      cfg=cfg, config=config, views=views, outdir=imgdir,
                      step=0)
    rec0["step"] = 0
    curve.append(rec0)
    print("init:", {k: round(v, 2) for k, v in rec0.items()})

  rng = jax.random.PRNGKey(1 + start_step)
  n_bootstrap_epochs = config.init_decay_epoch // 2
  losses, full_losses, step_times = [], [], []
  term_keys = ("rgb_loss", "disp_loss", "flow_loss", "cycle_loss",
               "reg_loss", "entropy_loss", "distortion_loss", "static_loss")

  def sample(np_rng):
    return data.sample_batch(np_rng, config.N_rand, config.sample_mode)

  schedule_events = []   # divisor transitions actually executed (late-
                         # schedule evidence: reference train.py:302-445)
  with PrefetchPipeline(sample, num_workers=config.workers, seed=0) as pipe:
    epoch_prev, weights, divisor_prev = -1, None, -1
    t_step0 = None
    for step in range(start_step + 1, args.steps + 1):
      epoch = step // data.num_frames
      if epoch != epoch_prev:
        data.set_epoch(epoch)
        weights = schedule_weights(config, epoch)
        divisor = epoch // config.init_decay_epoch
        if divisor != divisor_prev:
          ev = {"step": step, "epoch": epoch, "divisor": divisor,
                "w_disp": float(weights.w_disp),
                "w_flow": float(weights.w_flow),
                "dynamic_rgb_decay": float(weights.dynamic_rgb_decay),
                "use_dynamic_mask_rgb": float(weights.use_dynamic_mask_rgb),
                "suppress_dynamic": float(weights.suppress_dynamic)}
          schedule_events.append(ev)
          print(f"schedule: {ev}", flush=True)
          divisor_prev = divisor
        # one-shot pre-virtual-view snapshot at epoch init_decay_epoch*5,
        # same trigger as the production driver (cli/train.py:209-214,
        # reference train.py:503-506) so the compressed-schedule run
        # exercises the full late-phase surface
        if epoch == config.init_decay_epoch * 5:
          save_checkpoint(ckpt_dir, step, state.params, state.opt_state,
                          name="model_no-vv")
          print(f"saved model_no-vv snapshot at step {step} "
                f"(epoch {epoch})", flush=True)
        epoch_prev = epoch
      rb = next(pipe)
      rng, sub = jax.random.split(rng)
      t0 = time.perf_counter()
      if epoch < n_bootstrap_epochs:
        state, metrics = bootstrap_step(state, rb, None, sub)
      else:
        state, metrics = full_step(state, rb, weights, sub)
      loss = float(metrics["loss"])   # host sync => honest step timing
      if t_step0 is not None:
        step_times.append(time.perf_counter() - t0)
      t_step0 = t0
      losses.append(loss)
      if epoch >= n_bootstrap_epochs:
        full_losses.append(loss)
      if step % config.i_print == 0:
        gn = metrics.get("grad_norm")
        print(f"step {step} epoch {epoch} loss={loss:.4f} "
              f"psnr_batch={float(metrics['psnr']):.2f} "
              + (f"gnorm={float(gn):.2f} " if gn is not None else "")
              + f"({np.mean(step_times[-20:] or [0]):.3f}s/step)", flush=True)
      if step % args.eval_every == 0 or step == args.steps:
        rec = eval_views(model, state.params, scene, data, cfg, config,
                         views, outdir=imgdir, step=step)
        rec["step"] = step
        rec["loss"] = float(np.mean(losses[-50:]))
        rec["psnr_batch"] = float(metrics["psnr"])
        for k in term_keys:           # per-term snapshot of the last batch
          if k in metrics:
            rec[k] = float(metrics[k])
        curve.append(rec)
        print("eval:", {k: round(v, 4) for k, v in rec.items()}, flush=True)
        save_checkpoint(ckpt_dir, step, state.params, state.opt_state,
                        keep=40)
        # durable partial record: a dead tunnel must not lose the curve
        with open(out_path, "w") as fh:
          json.dump({"partial": True, "tag": args.tag, "steps_done": step,
                     "schedule_events": schedule_events,
                     "sec_per_step_mean": (float(np.mean(step_times))
                                           if step_times else None),
                     "curve": [{k: round(float(v), 4) for k, v in r.items()}
                               for r in curve]}, fh, indent=2)

  if args.quick:
    # tiny CI smoke: overfit signal only (train view up, loss down).
    # loss_drop compares medians WITHIN the full-loss phase: mixing the
    # (much smaller) bootstrap static losses into the first-quarter
    # median made an improving run read as a loss increase
    ref = full_losses if len(full_losses) >= 8 else losses
    rise = (curve[-1].get("psnr_train_view_crop3",
                          curve[-1]["psnr_train_view"])
            - curve[0].get("psnr_train_view_crop3",
                           curve[0]["psnr_train_view"]))
    q = max(len(ref) // 4, 1)
    loss_drop = float(np.median(ref[:q]) - np.median(ref[-q:]))
  else:
    # gate on the reference's output protocol (3% border crop, see
    # eval_views); fall back to full-image keys for old-format curves
    novel_keys = [k for k in curve[-1] if k.startswith("psnr_novel")
                  and k.endswith("_crop3")]
    if not novel_keys:
      novel_keys = [k for k in curve[-1] if k.startswith("psnr_novel")
                    and not k.endswith("_dyn")]
    rise = min(curve[-1][k] - curve[0][k] for k in novel_keys)
    loss_drop = None
  result = {
      "tag": args.tag,
      "backend": jax.default_backend(),
      "steps": args.steps,
      "config": {
          "N_rand": config.N_rand, "N_samples": config.N_samples,
          "frames": data.num_frames, "hw": [scene.h, scene.w],
          "clip_grad_norm": float(args.clip),
          "init_decay_epoch": config.init_decay_epoch,
          "compute_dtype": config.compute_dtype},
      "sec_per_step_mean": float(np.mean(step_times)) if step_times else None,
      "final": {k: round(float(v), 3) for k, v in curve[-1].items()},
      "init": {k: round(float(v), 3) for k, v in curve[0].items()},
      "novel_psnr_rise_db": round(float(rise), 3),
      "loss_drop": loss_drop,
      "schedule_events": schedule_events,
      "gate_db": args.gate_db,
      "gate_passed": bool(rise >= args.gate_db
                          and (loss_drop is None or loss_drop > 0)),
      "curve": [{k: round(float(v), 4) for k, v in r.items()}
                for r in curve],
  }
  with open(out_path, "w") as fh:
    json.dump(result, fh, indent=2)
  print(json.dumps({k: v for k, v in result.items() if k != "curve"}))
  print(f"wrote {out_path}")
  if not args.quick:   # CI smoke runs must not touch the repo's table
    _append_convergence_md(args, result, curve)
  if not result["gate_passed"]:
    print(f"GATE FAILED: novel-view PSNR rise {result['novel_psnr_rise_db']}"
          f" dB < {args.gate_db} dB", file=sys.stderr)
    sys.exit(1)


def _append_convergence_md(args, result, curve):
  """Append a summary row to CONVERGENCE.md at the repo root (creating the
  header on first use) so runs accumulate into one reviewable table."""
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  path = os.path.join(repo, "CONVERGENCE.md")
  novel = sorted(k for k in curve[-1]
                 if k.startswith("psnr_novel") and k.endswith("_crop3"))
  if not novel:
    novel = sorted(k for k in curve[-1]
                   if k.startswith("psnr_novel") and not k.endswith("_dyn"))
  header = (
      "# Convergence runs (scripts/convergence_run.py)\n\n"
      "Overfit of the mono model on the analytic multi-view-consistent\n"
      "scene (`data/synthetic_scene.ConsistentScene`); \"novel\" PSNR is on\n"
      "held-out cameras never seen in training, with exact ground truth,\n"
      "under the reference's 3% border-crop output protocol\n"
      "(render_monocular_bt.py crops every rendered frame).\n"
      "Gate: min novel-view PSNR rise over init >= gate_db.\n\n"
      "| tag | clip | steps | s/step | train-view PSNR (init→final) | "
      "min novel rise (dB) | novel finals (dB) | gate | date |\n"
      "|---|---|---|---|---|---|---|---|---|\n")
  if not os.path.exists(path):
    with open(path, "w") as fh:
      fh.write(header)
  sps = result["sec_per_step_mean"]
  # column 2 is the gradient clip (round-3 advisor finding: a backend
  # string in the clip column made the tpu3kstrip FAIL unauditable)
  row = ("| {tag} | {clip} | {steps} | {sps} | {tv0:.1f} → {tv1:.1f} | "
         "{rise:+.2f} | {novf} | {gate} | {date} |\n").format(
             tag=args.tag,
             clip=f"{args.clip:g}" if args.clip else "—", steps=args.steps,
             sps=f"{sps:.3f}" if sps else "-",
             tv0=curve[0].get("psnr_train_view_crop3",
                              curve[0]["psnr_train_view"]),
             tv1=curve[-1].get("psnr_train_view_crop3",
                               curve[-1]["psnr_train_view"]),
             rise=result["novel_psnr_rise_db"],
             novf=", ".join(f"{curve[-1][k]:.1f}" for k in novel) or "-",
             gate="PASS" if result["gate_passed"] else "FAIL",
             date=time.strftime("%Y-%m-%d"))
  with open(path, "a") as fh:
    fh.write(row)
  print(f"appended row to {path}")


if __name__ == "__main__":
  main()
