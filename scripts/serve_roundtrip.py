"""Drive the serving surface end to end against a trained checkpoint.

VERDICT r4 ask #6: the HTTP renderer had only CI evidence on synthetic
weights; this script exercises a real /healthz + /meta + /render +
/video round-trip on hardware against a trained mono checkpoint and
saves the returned artifacts (PNG frame, wander MP4, timing JSON) for
docs/.  Reference surface being matched: render_monocular_bt.py's
offline outputs, served live (the reference has no serving layer).

  python scripts/serve_roundtrip.py \
      --root /tmp/dynibar_convergence/scene_24x96x144 --scene consistent \
      --ckpt_path <orbax step dir> --out docs/serving
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def wait_healthy(base: str, deadline_s: float) -> dict:
  t0 = time.time()
  while time.time() - t0 < deadline_s:
    try:
      with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
        return json.loads(r.read())
    except Exception:
      time.sleep(2.0)
  raise TimeoutError(f"server not healthy after {deadline_s}s")


def post(base: str, path: str, body: dict, timeout: float = 600.0):
  req = urllib.request.Request(
      base + path, data=json.dumps(body).encode(),
      headers={"Content-Type": "application/json"})
  t0 = time.perf_counter()
  with urllib.request.urlopen(req, timeout=timeout) as r:
    data = r.read()
    ctype = r.headers.get("Content-Type", "")
  return data, ctype, time.perf_counter() - t0


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--root", required=True,
                  help="folder_path holding <scene>/dense/...")
  ap.add_argument("--scene", default="consistent")
  ap.add_argument("--ckpt_path", required=True,
                  help="orbax step dir of the trained mono checkpoint")
  ap.add_argument("--out", default="docs/serving")
  ap.add_argument("--port", type=int, default=8013)
  ap.add_argument("--height", type=int, default=96)
  ap.add_argument("--wander_frames", type=int, default=12)
  ap.add_argument("--startup_timeout", type=float, default=1800.0,
                  help="includes the warmup compile through the tunnel")
  # model-architecture flags must match the checkpoint being served
  ap.add_argument("--n_samples", type=int, default=64)
  ap.add_argument("--num_source_views", type=int, default=7)
  ap.add_argument("--num_vv", type=int, default=3)
  ap.add_argument("--num_basis", type=int, default=6)
  ap.add_argument("--max_range", type=int, default=24)
  ap.add_argument("--chunk_size", type=int, default=4608)
  args = ap.parse_args()

  os.makedirs(args.out, exist_ok=True)
  base = f"http://127.0.0.1:{args.port}"
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

  server = subprocess.Popen(
      [sys.executable, "-m", "dynibar_tpu.serve.server",
       "--port", str(args.port),
       "--folder_path", args.root, "--train_scenes", args.scene,
       "--training_height", str(args.height),
       "--num_source_views", str(args.num_source_views),
       "--num_basis", str(args.num_basis), "--num_vv", str(args.num_vv),
       "--max_range", str(args.max_range),
       "--N_samples", str(args.n_samples), "--N_importance", "0",
       "--chunk_size", str(args.chunk_size),
       "--ckpt_path", args.ckpt_path],
      cwd=repo, stdout=open(os.path.join(args.out, "server.log"), "w"),
      stderr=subprocess.STDOUT)
  timings = {}
  try:
    t0 = time.perf_counter()
    health = wait_healthy(base, args.startup_timeout)
    timings["startup_plus_warmup_s"] = round(time.perf_counter() - t0, 1)
    print("healthz:", health)

    with urllib.request.urlopen(base + "/meta", timeout=30) as r:
      meta = json.loads(r.read())
    print("meta:", meta)

    # a real scene pose for /render, in the LOADER world (scaled +
    # recentered, the same transform the session's dataset applies):
    # raw poses_bounds rows live in the disk world and render empty
    # frames if posted directly
    from dynibar_tpu.data.llff import load_scene_poses, parse_llff_pose
    meta_scene = load_scene_poses(
        os.path.join(args.root, args.scene, "dense"),
        height=meta["height"], with_vv=True)
    mid = meta["num_frames"] // 2
    _, c2w = parse_llff_pose(meta_scene["poses"][mid])

    png, ctype, dt = post(base, "/render",
                          {"c2w": c2w.tolist(), "frame_idx": mid})
    assert ctype == "image/png" and png[:4] == b"\x89PNG", ctype
    with open(os.path.join(args.out, "render_frame.png"), "wb") as fh:
      fh.write(png)
    timings["render_png_s"] = round(dt, 2)
    print(f"/render -> {len(png)} bytes png in {dt:.2f}s")

    npy, ctype, dt = post(base, "/render",
                          {"c2w": c2w.tolist(), "frame_idx": mid,
                           "format": "npy", "layer": "depth"})
    timings["render_depth_npy_s"] = round(dt, 2)
    print(f"/render depth npy -> {len(npy)} bytes in {dt:.2f}s")

    mp4, ctype, dt = post(base, "/video",
                          {"path": "wander", "render_idx": mid,
                           "num_frames": args.wander_frames, "fps": 8},
                          timeout=1800.0)
    assert ctype == "video/mp4", ctype
    with open(os.path.join(args.out, "wander.mp4"), "wb") as fh:
      fh.write(mp4)
    timings["video_wander_s"] = round(dt, 2)
    timings["video_wander_frames"] = args.wander_frames
    print(f"/video wander -> {len(mp4)} bytes mp4 in {dt:.2f}s")

    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
      stats = json.loads(r.read())
    record = {"healthz": health, "meta": meta, "timings": timings,
              "stats": stats}
    with open(os.path.join(args.out, "roundtrip.json"), "w") as fh:
      json.dump(record, fh, indent=2)
    print(json.dumps(timings))
  finally:
    server.terminate()
    try:
      server.wait(timeout=20)
    except subprocess.TimeoutExpired:
      server.kill()


if __name__ == "__main__":
  main()
