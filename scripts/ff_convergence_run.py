"""FF (forward-facing / Nvidia-benchmark) convergence experiment.

VERDICT round-3 ask #6: the FF fine-stage trainer was the only
self-designed subsystem with no optimization evidence.  This runner
trains the FULL FF chain on the analytic multi-view-consistent scene in
the Nvidia benchmark layout (12-camera round-robin rig,
``ConsistentScene.write_nvidia``) on the real chip:

  phase A  coarse-stage training (``make_ff_coarse_train_step`` — the run
           that produces the frozen checkpoint the reference only ships
           as data, model.py:102), and
  phase B  fine-stage training on top of the frozen phase-A coarse
           (``make_ff_train_step``, reference optimizer layout
           model.py:106-118).

Gate: on held-out (viewpoint, time) pairs — rig cameras that did NOT
capture that frame, with exact analytic GT — the fine render's PSNR must
(a) rise over its own phase-B init by >= gate_db and (b) end above the
frozen-coarse-only render.  Writes <outdir>/ff_convergence_<tag>.json +
renders, appends a row to CONVERGENCE.md.

  python scripts/ff_convergence_run.py                # TPU run
  python scripts/ff_convergence_run.py --quick        # tiny CPU smoke
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
  ap.add_argument("--coarse_steps", type=int, default=1500)
  ap.add_argument("--fine_steps", type=int, default=2500)
  ap.add_argument("--eval_every", type=int, default=250)
  ap.add_argument("--frames", type=int, default=48)
  ap.add_argument("--height", type=int, default=96)
  ap.add_argument("--width", type=int, default=144)
  ap.add_argument("--n_rand", type=int, default=3072)
  ap.add_argument("--n_rand_fine", type=int, default=2048,
                  help="phase-B ray batch; the fine step carries the "
                       "frozen coarse forward + 64+64-sample fine stage "
                       "with anchors, and 3072x128 samples exceeds one "
                       "v5e chip's HBM (measured 17.2G vs 15.75G)")
  ap.add_argument("--outdir", type=str, default="/tmp/dynibar_ff_convergence")
  ap.add_argument("--tag", type=str, default="ff")
  ap.add_argument("--gate_db", type=float, default=5.0,
                  help="required fine PSNR rise over phase-B init (dB)")
  ap.add_argument("--clip", type=float, default=1.0,
                  help="global-norm grad clip (mono runs showed the motion "
                       "field can collapse unclipped; default on here)")
  ap.add_argument("--quick", action="store_true")
  ap.add_argument("--resume_coarse", type=str, default="",
                  help="skip phase A; load coarse params from this orbax dir")
  ap.add_argument("--resume_fine", action="store_true",
                  help="resume phase B from ckpt_<tag>_B (params + opt "
                       "state + step), merging the prior partial curve")
  return ap.parse_args()


def build(args):
  from dynibar_tpu.config import DynibarConfig
  from dynibar_tpu.data.nvidia import NvidiaSceneData
  from dynibar_tpu.data.synthetic_scene import ConsistentScene

  if args.quick:
    args.frames, args.height, args.width = 24, 40, 60
    args.coarse_steps = min(args.coarse_steps, 60)
    args.fine_steps = min(args.fine_steps, 60)
    args.eval_every = min(args.eval_every, 30)
    args.n_rand = 128

  scene = ConsistentScene(num_frames=args.frames, height=args.height,
                          width=args.width)
  root = os.path.join(args.outdir,
                      f"scene_{args.frames}x{args.height}x{args.width}")
  name = "consistent_nvidia"
  if not os.path.exists(os.path.join(root, name, "dense",
                                     "poses_bounds_cvd.npy")):
    os.makedirs(root, exist_ok=True)
    scene.write_nvidia(root, name)
    print(f"wrote nvidia-layout scene to {root}")

  common = dict(
      folder_path=root, train_scenes=[name], training_height=args.height,
      N_rand=args.n_rand, num_source_views=7,
      init_decay_epoch=40, chunk_size=2048 if not args.quick else 512,
      clip_grad_norm=args.clip, mask_static=False, workers=2, i_print=50)
  if args.quick:
    config = DynibarConfig(N_samples=12, N_importance=12, num_basis=4,
                           compute_dtype="float32", use_remat=False,
                           fused_aggregators=False, **common)
  else:
    config = DynibarConfig(N_samples=64, N_importance=64, num_basis=6,
                           compute_dtype="bfloat16", use_remat=True,
                           fused_aggregators=True, **common)

  cfg = config.render_settings("ff_train")
  data = NvidiaSceneData(config, name, cfg=cfg, height=args.height)
  config.num_frames = data.num_frames
  config.lrate_decay_steps = config.num_frames * config.init_decay_epoch
  return scene, config, cfg, data


def held_out_views(scene, data):
  """(viewpoint, frame) pairs whose rig camera did NOT capture that frame.
  Returns [(name, cam34, gt_rgb, dyn_mask), ...] — loader-world camera from
  the same rig slot's nearest frame, exact GT from the analytic scene."""
  from dynibar_tpu.core.cameras import make_camera
  pairs = []
  mid = scene.num_frames // 2
  for frame, vp in ((mid, (mid + 5) % 12), (mid + 1, (mid + 1 + 6) % 12)):
    # loader-world pose of rig camera `vp`: any frame captured by that slot
    j = min(range(vp, scene.num_frames, 12),
            key=lambda j: abs(j - frame))
    cam = make_camera(scene.h, scene.w, data.intrinsics[j], data.c2w[j])
    gt, _, dyn = scene.render(scene.rig_c2w(vp), float(frame))
    pairs.append((f"f{frame}_cam{vp}", cam, np.asarray(frame, np.float32),
                  gt, dyn))
  return pairs


def eval_ff(model, params, data, cfg, config, views, outdir=None, step=None,
            tag=""):
  import jax.numpy as jnp
  from dynibar_tpu.eval.metrics import masked_psnr
  from dynibar_tpu.render.render_image import (full_image_ray_batch,
                                               render_image_ff)
  rec = {}
  for vname, cam, frame, gt, dyn in views:
    idx = int(frame)
    template = data.eval_batch(idx, 0)
    template["camera"] = cam
    rb = {k: jnp.asarray(v) for k, v in template.items()
          if k != "static_src_masks"}
    rb = full_image_ray_batch(rb, jnp.asarray(cam))
    c_src, _ = model.apply_feature(params, "feature_net", rb["src_rgbs"])
    _, c_st = model.apply_feature(params, "feature_net",
                                  rb["static_src_rgbs"])
    f_src, _ = model.apply_feature(params, "feature_net_fine",
                                   rb["src_rgbs"])
    _, f_st = model.apply_feature(params, "feature_net_fine",
                                  rb["static_src_rgbs"])
    h, w = gt.shape[:2]
    ret = render_image_ff(model, params, rb, (c_src, None, c_st),
                          (f_src, None, f_st), cfg, config.chunk_size, h, w)
    for stage in ("coarse", "fine"):
      rgb = np.asarray(ret[f"outputs_{stage}_ref"]["rgb"], np.float32)
      ch, cw = max(1, round(0.03 * h)), max(1, round(0.03 * w))
      crop = np.s_[ch:h - ch, cw:w - cw]
      rec[f"psnr_{vname}_{stage}_crop3"] = masked_psnr(
          rgb[crop], gt[crop], np.ones_like(gt[crop]))
      if dyn.any() and stage == "fine":
        dyn3 = np.repeat(dyn[..., None].astype(np.float32), 3, axis=-1)
        rec[f"psnr_{vname}_fine_dyn"] = masked_psnr(rgb, gt, dyn3)
      if outdir is not None and stage == "fine":
        import imageio.v2 as imageio
        imageio.imwrite(
            os.path.join(outdir, f"{vname}_{tag}_step{step:06d}.png"),
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    if outdir is not None:
      import imageio.v2 as imageio
      gt_path = os.path.join(outdir, f"{vname}_gt.png")
      if not os.path.exists(gt_path):
        imageio.imwrite(gt_path, (np.clip(gt, 0, 1) * 255).astype(np.uint8))
  return rec


def main():
  args = parse_args()
  os.makedirs(args.outdir, exist_ok=True)
  if args.quick:
    os.environ["JAX_PLATFORMS"] = "cpu"
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()
  import jax
  import jax.numpy as jnp
  from dynibar_tpu.data.pipeline import PrefetchPipeline
  from dynibar_tpu.models.dynibar import FFModel
  from dynibar_tpu.train.losses import schedule_weights
  from dynibar_tpu.train.trainer import (TrainState, create_ff_train_state,
                                         make_ff_coarse_optimizer,
                                         make_ff_coarse_train_step,
                                         make_ff_train_step)
  from dynibar_tpu.utils.checkpoints import (latest_checkpoint,
                                             load_checkpoint, save_checkpoint)

  scene, config, cfg, data = build(args)
  model = FFModel(cfg=cfg, num_frames=data.num_frames,
                  remat=config.use_remat)
  views = held_out_views(scene, data)
  imgdir = os.path.join(args.outdir, f"renders_{args.tag}")
  os.makedirs(imgdir, exist_ok=True)
  out_path = os.path.join(args.outdir, f"ff_convergence_{args.tag}.json")
  ckpt_coarse = os.path.join(args.outdir, f"ckpt_{args.tag}_coarse")
  print(f"[{args.tag}] backend={jax.default_backend()} "
        f"frames={data.num_frames} {scene.h}x{scene.w} "
        f"N_rand={config.N_rand} A={args.coarse_steps} B={args.fine_steps}")

  def run_phase(state, step_fn, steps, phase, curve, start=0):
    rng = jax.random.PRNGKey((11 if phase == "A" else 23) + start)
    n_rand = config.N_rand if phase == "A" else min(config.N_rand,
                                                    args.n_rand_fine)
    losses, step_times = [], []
    with PrefetchPipeline(
        lambda r: data.sample_batch(r, n_rand, config.sample_mode),
        num_workers=config.workers,
        seed=(0 if phase == "A" else 1) + start) as pipe:
      # advance the loss schedule per data epoch (= num_frames steps),
      # matching the mono protocol (cli/train.py:163-164); weights are
      # traced jnp scalars so a divisor change never retraces
      epoch = -1
      for step in range(start + 1, steps + 1):
        if step // data.num_frames != epoch:
          epoch = step // data.num_frames
          weights = schedule_weights(config, epoch)
        rb = next(pipe)
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = step_fn(state, rb, weights, sub)
        loss = float(metrics["loss"])     # host sync
        step_times.append(time.perf_counter() - t0)
        losses.append(loss)
        if step % config.i_print == 0:
          print(f"[{phase}] step {step} loss={loss:.4f} "
                f"psnr_batch={float(metrics['psnr']):.2f} "
                f"gnorm={float(metrics['grad_norm']):.2f} "
                f"({np.mean(step_times[-20:]):.3f}s/step)", flush=True)
        if step % args.eval_every == 0 or step == steps:
          rec = eval_ff(model, state.params, data, cfg, config, views,
                        outdir=imgdir, step=step, tag=phase)
          rec.update(step=step, phase=phase,
                     loss=float(np.mean(losses[-50:])))
          curve.append(rec)
          print(f"eval[{phase}]:",
                {k: round(v, 2) for k, v in rec.items()
                 if isinstance(v, float)}, flush=True)
          with open(out_path, "w") as fh:   # durable partial record
            json.dump({"partial": True, "tag": args.tag,
                       "curve": _round(curve)}, fh, indent=2)
          # checkpoint EVERY eval: the remote tunnel does die mid-RPC
          # (the mono 10k run lost step 9900-10000 this way; this run's
          # first attempt lost 2000 fine steps)
          from dynibar_tpu.utils.checkpoints import save_checkpoint
          save_checkpoint(os.path.join(args.outdir,
                                       f"ckpt_{args.tag}_{phase}"),
                          step, state.params, state.opt_state, keep=3)
    return state, losses

  curve = []

  # ---- phase A: coarse stage ----
  if args.resume_coarse:
    payload = load_checkpoint(latest_checkpoint(args.resume_coarse))
    coarse_params = payload.get("params", payload)
    print(f"loaded coarse params from {args.resume_coarse}")
  else:
    params0 = model.init_params(jax.random.PRNGKey(0))
    tx_a = make_ff_coarse_optimizer(config)
    state_a = TrainState(params=params0, opt_state=tx_a.init(params0),
                         step=jnp.zeros((), jnp.int32))
    step_a = make_ff_coarse_train_step(model, tx_a, cfg, donate=False)
    rec0 = eval_ff(model, state_a.params, data, cfg, config, views,
                   outdir=imgdir, step=0, tag="A")
    rec0.update(step=0, phase="A")
    curve.append(rec0)
    print("init:", {k: round(v, 2) for k, v in rec0.items()
                    if isinstance(v, float)})
    state_a, _ = run_phase(state_a, step_a, args.coarse_steps, "A", curve)
    save_checkpoint(ckpt_coarse, args.coarse_steps, state_a.params,
                    state_a.opt_state, keep=2)
    coarse_params = state_a.params

  # ---- phase B: fine stage on frozen coarse ----
  from dynibar_tpu.train.trainer import FF_COARSE_KEYS
  state_b, tx_b = create_ff_train_state(
      model, config, jax.random.PRNGKey(1),
      coarse_params={k: coarse_params[k] for k in FF_COARSE_KEYS})
  step_b = make_ff_train_step(model, tx_b, cfg, donate=False)
  start_b = 0
  if args.resume_fine:
    path_b = latest_checkpoint(os.path.join(args.outdir,
                                            f"ckpt_{args.tag}_B"))
    if path_b is not None:
      # restore with a payload-shaped template: optax multi_transform
      # states are namedtuples that a template-less orbax restore
      # flattens to plain dicts, which tx.update then rejects
      # (utils/checkpoints.py:60-69)
      payload = load_checkpoint(
          path_b, {"params": state_b.params, "opt_state": state_b.opt_state,
                   "step": np.int32(0)})
      state_b = TrainState(params=payload["params"],
                           opt_state=payload["opt_state"],
                           step=jnp.asarray(payload["step"], jnp.int32))
      start_b = int(payload["step"])
      print(f"resumed phase B from {path_b} at step {start_b}")
      if os.path.exists(out_path):
        with open(out_path) as fh:
          prev = json.load(fh)
        merged = [r for r in prev.get("curve", [])
                  if r.get("phase") != "B" or r.get("step", 0) <= start_b]
        if merged:
          curve[:] = merged
          print(f"merged {len(merged)} prior eval points")
  if start_b == 0:
    rec_b0 = eval_ff(model, state_b.params, data, cfg, config, views,
                     outdir=imgdir, step=0, tag="B")
    rec_b0.update(step=0, phase="B")
    curve.append(rec_b0)
    print("phase-B init:", {k: round(v, 2) for k, v in rec_b0.items()
                            if isinstance(v, float)})
  # baseline for the rise gate: the phase-B step-0 eval, or (when a resumed
  # partial curve predates the first phase-B eval) the earliest phase-B
  # record; re-run the init eval if there is none at all
  b_records = sorted((r for r in curve if r.get("phase") == "B"),
                     key=lambda r: r.get("step", 0))
  if b_records:
    rec_b0 = b_records[0]
  else:
    rec_b0 = eval_ff(model, state_b.params, data, cfg, config, views,
                     outdir=imgdir, step=start_b, tag="B")
    rec_b0.update(step=start_b, phase="B")
    curve.append(rec_b0)
  state_b, losses_b = run_phase(state_b, step_b, args.fine_steps, "B",
                                curve, start=start_b)

  fine_keys = [k for k in curve[-1]
               if "_fine_crop3" in k and k.startswith("psnr_")]
  rise = min(curve[-1][k] - rec_b0[k] for k in fine_keys)
  coarse_only = {k.replace("_fine_", "_coarse_"): rec_b0[
      k.replace("_fine_", "_coarse_")] for k in fine_keys}
  above_coarse = min(
      curve[-1][k] - rec_b0[k.replace("_fine_", "_coarse_")]
      for k in fine_keys)
  result = {
      "tag": args.tag, "backend": jax.default_backend(),
      "coarse_steps": args.coarse_steps, "fine_steps": args.fine_steps,
      "config": {"N_rand": config.N_rand, "N_samples": config.N_samples,
                 "N_importance": config.N_importance,
                 "frames": data.num_frames, "hw": [scene.h, scene.w],
                 "clip_grad_norm": float(args.clip),
                 "compute_dtype": config.compute_dtype},
      "final": _round([curve[-1]])[0],
      "fine_init": _round([rec_b0])[0],
      "coarse_only_psnr": {k: round(float(v), 3)
                           for k, v in coarse_only.items()},
      "fine_rise_db": round(float(rise), 3),
      "fine_minus_frozen_coarse_db": round(float(above_coarse), 3),
      "gate_db": args.gate_db,
      "gate_passed": bool(rise >= args.gate_db and above_coarse > 0),
      "curve": _round(curve),
  }
  with open(out_path, "w") as fh:
    json.dump(result, fh, indent=2)
  print(json.dumps({k: v for k, v in result.items() if k != "curve"}))
  if not args.quick:
    _append_md(args, result, curve)
  if not result["gate_passed"]:
    print(f"GATE FAILED: fine rise {result['fine_rise_db']} dB "
          f"(gate {args.gate_db}), fine-vs-coarse "
          f"{result['fine_minus_frozen_coarse_db']} dB", file=sys.stderr)
    sys.exit(1)


def _round(curve):
  return [{k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
           for k, v in r.items()} for r in curve]


def _append_md(args, result, curve):
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  path = os.path.join(repo, "CONVERGENCE.md")
  row = ("| {tag} (FF A+B) | {clip:g} | {a}+{b} | — | coarse→fine on "
         "held-out | {rise:+.2f} | fine−frozen-coarse {above:+.2f} | "
         "{gate} | {date} |\n").format(
             tag=args.tag, clip=args.clip, a=args.coarse_steps,
             b=args.fine_steps, rise=result["fine_rise_db"],
             above=result["fine_minus_frozen_coarse_db"],
             gate="PASS" if result["gate_passed"] else "FAIL",
             date=time.strftime("%Y-%m-%d"))
  with open(path, "a") as fh:
    fh.write(row)
  print(f"appended row to {path}")


if __name__ == "__main__":
  main()
