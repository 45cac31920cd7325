"""HTTP rendering service around :class:`serve.session.RenderSession`.

Stdlib-only (ThreadingHTTPServer); endpoints:

  GET  /healthz   -> {"status": "ok", "checkpoint_step": N}
  GET  /meta      -> scene metadata (frames, resolution, depth range)
  GET  /scenes    -> {"available": [...], "loaded": [...], ...}
  GET  /stats     -> render/cache counters and cumulative timings
  POST /render    -> image bytes
      JSON body: {"c2w": [[...4x4 or 3x4...]],      (required)
                  "frame_idx": int,                  (required)
                  "scene": str,                      (optional, multi-scene)
                  "h": int, "w": int,                (optional)
                  "intrinsics": [[...4x4...]],       (optional)
                  "stride": int,                     (optional, preview)
                  "format": "png" | "npy",           (optional, default png)
                  "layer": "rgb" | "rgb_dy" | "rgb_st" | "depth"}
  POST /video     -> video/mp4 bytes (buffered; body below)
  POST /stream    -> multipart/x-mixed-replace stream of PNG (or npy)
      frames, one part per camera-path pose, written as each frame
      finishes rendering — a client sees the first frame after one
      render, not after the whole path.  Same body as /video.

POST bodies addressing a multi-scene server carry {"scene": name};
omitted -> the first configured scene (backwards compatible).

Run:  python -m dynibar_tpu.serve.server --config <cfg> --port 8008
Serving defaults to the production compute mode (bfloat16 + fused
aggregator kernels); pass --f32 to keep the config file's dtype.

The reference repo has no serving story (its render_monocular_bt.py is a
one-shot batch script); this is the deployment surface ROADMAP.md item 6
calls for.  One render runs on device at a time per scene; HTTP threads
queue on the session lock.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Union

import numpy as np

from dynibar_tpu.serve.registry import SessionRegistry
from dynibar_tpu.serve.session import RenderSession


def _encode_png(img: np.ndarray) -> bytes:
  import imageio.v2 as imageio
  buf = io.BytesIO()
  imageio.imwrite(buf, (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8),
                  format="png")
  return buf.getvalue()


def _encode_npy(arr: np.ndarray) -> bytes:
  buf = io.BytesIO()
  np.save(buf, arr)
  return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
  registry: SessionRegistry  # injected by make_server

  # ------------------------------------------------------------- plumbing
  def _send(self, code: int, body: bytes, ctype: str = "application/json"):
    self.send_response(code)
    self.send_header("Content-Type", ctype)
    self.send_header("Content-Length", str(len(body)))
    self.end_headers()
    self.wfile.write(body)

  def _send_json(self, code: int, obj) -> None:
    self._send(code, json.dumps(obj).encode())

  def _session(self, req: Optional[dict] = None) -> RenderSession:
    return self.registry.get((req or {}).get("scene"))

  def log_message(self, fmt, *args):  # quiet by default
    pass

  # ------------------------------------------------------------------ GET
  def do_GET(self):
    from urllib.parse import parse_qs, urlparse
    url = urlparse(self.path)
    # GET endpoints select a scene with ?scene=<name>
    q = {k: v[0] for k, v in parse_qs(url.query).items()}
    try:
      if url.path == "/healthz":
        s = self._session(q)
        self._send_json(200, {"status": "ok",
                              "checkpoint_step": int(s.step)})
      elif url.path == "/meta":
        self._send_json(200, self._session(q).meta())
      elif url.path == "/scenes":
        self._send_json(200, self.registry.scenes())
      elif url.path == "/stats":
        s = self._session(q)
        self._send_json(200, {"counters": dict(s.stats),
                              "timings_s": dict(s.timings)})
      else:
        self._send_json(404, {"error": f"unknown path {url.path}"})
    except KeyError as e:
      self._send_json(400, {"error": str(e)})

  # ----------------------------------------------------------------- POST
  def do_POST(self):
    if self.path == "/video":
      self._do_video()
      return
    if self.path == "/stream":
      self._do_stream()
      return
    if self.path != "/render":
      self._send_json(404, {"error": f"unknown path {self.path}"})
      return
    try:
      length = int(self.headers.get("Content-Length", "0"))
      req = json.loads(self.rfile.read(length) or b"{}")
      c2w = np.asarray(req["c2w"], np.float32)
      out = self._session(req).render(
          c2w, int(req["frame_idx"]),
          h=req.get("h"), w=req.get("w"),
          intrinsics=(np.asarray(req["intrinsics"], np.float32)
                      if req.get("intrinsics") is not None else None),
          stride=int(req.get("stride", 1)),
          layers=req.get("layer", "rgb") in ("rgb_dy", "rgb_st"))
      layer = req.get("layer", "rgb")
      if layer not in out:
        self._send_json(400, {"error": f"unknown layer {layer!r}"})
        return
      img = out[layer]
      if req.get("format", "png") == "npy":
        self._send(200, _encode_npy(img), "application/octet-stream")
      else:
        if img.ndim == 2:  # depth -> normalized grayscale png
          lo, hi = float(img.min()), float(img.max())
          img = (img - lo) / max(hi - lo, 1e-8)
        self._send(200, _encode_png(img), "image/png")
    except (KeyError, ValueError, TypeError) as e:
      self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
    except Exception as e:  # noqa: BLE001 — keep the server alive
      self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

  def _do_video(self):
    """POST /video -> video/mp4 bytes.

    JSON body, either an explicit path:
        {"c2ws": [[...4x4...], ...], "frame_idxs": [int, ...]}
    or a named generator over the loaded scene:
        {"path": "stabilization" | "wander",
         "render_idx": int,            (wander center; optional)
         "num_frames": int}            (wander length; optional)
    plus common options {"fps": 24, "stride": 1,
                         "layer": "rgb"|"rgb_dy"|"rgb_st"|"depth"}.
    """
    from dynibar_tpu.serve import video as video_lib
    try:
      length = int(self.headers.get("Content-Length", "0"))
      req = json.loads(self.rfile.read(length) or b"{}")
      session = self._session(req)
      c2ws, idxs = _path_spec(req, session)
      frames = session.render_path(
          c2ws, idxs, stride=int(req.get("stride", 1)),
          layer=req.get("layer", "rgb"))
      body = video_lib.encode_mp4(frames, fps=float(req.get("fps", 24.0)))
      self._send(200, body, "video/mp4")
    except (KeyError, ValueError, TypeError) as e:
      self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
    except Exception as e:  # noqa: BLE001 — keep the server alive
      self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

  def _do_stream(self):
    """POST /stream -> multipart/x-mixed-replace frame stream.

    Same body as /video plus {"format": "png" | "npy"}.  Each camera-path
    frame is written as ONE multipart part the moment its render returns —
    a preview client displays frame k while frame k+1 is still on device.
    Depth frames are normalized per-frame here (the full-path range is
    unknowable before the last frame; use /video for flicker-free depth).
    """
    boundary = "dynibar-frame"
    try:
      length = int(self.headers.get("Content-Length", "0"))
      req = json.loads(self.rfile.read(length) or b"{}")
      session = self._session(req)
      c2ws, idxs = _path_spec(req, session)
      if len(c2ws) != len(idxs):
        raise ValueError(f"{len(c2ws)} poses vs {len(idxs)} frame_idxs")
      stride = int(req.get("stride", 1))
      layer = req.get("layer", "rgb")
      fmt = req.get("format", "png")
    except (KeyError, ValueError, TypeError) as e:
      self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
      return
    except Exception as e:  # noqa: BLE001
      self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
      return

    self.send_response(200)
    self.send_header("Content-Type",
                     f"multipart/x-mixed-replace; boundary={boundary}")
    self.send_header("X-Frame-Count", str(len(c2ws)))
    self.end_headers()
    try:
      for i, (c2w, idx) in enumerate(zip(c2ws, idxs)):
        out = session.render(np.asarray(c2w, np.float32), int(idx),
                             stride=stride,
                             layers=layer in ("rgb_dy", "rgb_st"))
        if layer not in out:
          break  # already-streamed responses cannot switch to an error code
        img = out[layer]
        if fmt == "npy":
          payload, ctype = _encode_npy(img), "application/octet-stream"
        else:
          if img.ndim == 2:
            lo, hi = float(img.min()), float(img.max())
            img = (img - lo) / max(hi - lo, 1e-8)
          payload, ctype = _encode_png(img), "image/png"
        self.wfile.write(
            f"--{boundary}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"X-Frame-Index: {i}\r\n\r\n".encode())
        self.wfile.write(payload)
        self.wfile.write(b"\r\n")
        self.wfile.flush()
      self.wfile.write(f"--{boundary}--\r\n".encode())
    except (BrokenPipeError, ConnectionResetError):
      pass  # client went away mid-path; stop rendering


def _path_spec(req: dict, session: RenderSession):
  """Shared /video + /stream body parsing -> (c2ws, frame_idxs)."""
  from dynibar_tpu.serve import video as video_lib
  if "path" in req:
    spec = video_lib.named_path(
        req["path"], session.data,
        render_idx=int(req.get("render_idx", -1)),
        num_frames=req.get("num_frames"))
    return spec["c2ws"], spec["frame_idxs"]
  c2ws = [np.asarray(p, np.float32) for p in req["c2ws"]]
  idxs = [int(i) for i in req["frame_idxs"]]
  return c2ws, idxs


def make_server(target: Union[RenderSession, SessionRegistry],
                host: str = "127.0.0.1", port: int = 0
                ) -> ThreadingHTTPServer:
  """Build (not start) the HTTP server; port=0 picks a free port.

  `target` is a SessionRegistry (multi-scene) or a bare RenderSession
  (wrapped into a single-entry registry for compatibility)."""
  registry = (SessionRegistry.from_session(target)
              if isinstance(target, RenderSession) else target)
  handler = type("BoundHandler", (_Handler,), {"registry": registry})
  return ThreadingHTTPServer((host, port), handler)


def serve_forever(target: Union[RenderSession, SessionRegistry],
                  host: str, port: int,
                  ready: Optional[threading.Event] = None) -> None:
  httpd = make_server(target, host, port)
  if ready is not None:
    ready.set()
  print(f"dynibar_tpu renderer serving on http://{host}:{httpd.server_port}")
  httpd.serve_forever()


def main():
  import argparse
  from dynibar_tpu.cli.train import parse_args as parse_config_args
  from dynibar_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache()

  ap = argparse.ArgumentParser(add_help=False)
  ap.add_argument("--host", default="127.0.0.1")
  ap.add_argument("--port", type=int, default=8008)
  ap.add_argument("--no_warmup", action="store_true")
  ap.add_argument("--max_sessions", type=int, default=4,
                  help="resident scenes (LRU-evicted beyond this)")
  ap.add_argument("--f32", action="store_true",
                  help="keep the config dtype instead of the bf16+fused "
                       "serving default")
  args, rest = ap.parse_known_args()

  import sys
  sys.argv = [sys.argv[0]] + rest
  config = parse_config_args()
  if not config.train_scenes:
    raise SystemExit("error: no scene — pass --config <file> with "
                     "`train_scenes = <scene>[+<scene>...]` or "
                     "--train_scenes <scene>")
  if not args.f32:
    # production serving mode: bf16 everywhere the precision policy
    # allows + fused Pallas aggregators (DESIGN.md §2/§4) — the measured
    # fast path; checkpoints are dtype-independent (params stay f32)
    config.compute_dtype = "bfloat16"
    config.fused_aggregators = True
  registry = SessionRegistry(config, max_sessions=args.max_sessions)
  if not args.no_warmup:
    dt = registry.get().warmup()
    print(f"warmup render (compile) took {dt:.1f}s")
  serve_forever(registry, args.host, args.port)


if __name__ == "__main__":
  main()
