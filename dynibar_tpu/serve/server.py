"""HTTP rendering service around :class:`serve.session.RenderSession`.

Stdlib-only (ThreadingHTTPServer); endpoints:

  GET  /healthz   -> {"status": "ok", "checkpoint_step": N}
  GET  /meta      -> scene metadata (frames, resolution, depth range)
  GET  /stats     -> render/cache counters and cumulative timings
  POST /render    -> image bytes
      JSON body: {"c2w": [[...4x4 or 3x4...]],      (required)
                  "frame_idx": int,                  (required)
                  "h": int, "w": int,                (optional)
                  "intrinsics": [[...4x4...]],       (optional)
                  "stride": int,                     (optional, preview)
                  "format": "png" | "npy",           (optional, default png)
                  "layer": "rgb" | "rgb_dy" | "rgb_st" | "depth"}

Run:  python -m dynibar_tpu.serve.server --config <cfg> --port 8008

The reference repo has no serving story (its render_monocular_bt.py is a
one-shot batch script); this is the deployment surface ROADMAP.md item 6
calls for.  One render runs on device at a time; HTTP threads queue on the
session lock.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

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
  session: RenderSession  # injected by make_server

  # ------------------------------------------------------------- plumbing
  def _send(self, code: int, body: bytes, ctype: str = "application/json"):
    self.send_response(code)
    self.send_header("Content-Type", ctype)
    self.send_header("Content-Length", str(len(body)))
    self.end_headers()
    self.wfile.write(body)

  def _send_json(self, code: int, obj) -> None:
    self._send(code, json.dumps(obj).encode())

  def log_message(self, fmt, *args):  # quiet by default
    pass

  # ------------------------------------------------------------------ GET
  def do_GET(self):
    s = self.session
    if self.path == "/healthz":
      self._send_json(200, {"status": "ok",
                            "checkpoint_step": int(s.step)})
    elif self.path == "/meta":
      self._send_json(200, s.meta())
    elif self.path == "/stats":
      self._send_json(200, {"counters": dict(s.stats),
                            "timings_s": dict(s.timings)})
    else:
      self._send_json(404, {"error": f"unknown path {self.path}"})

  # ----------------------------------------------------------------- POST
  def do_POST(self):
    if self.path == "/video":
      self._do_video()
      return
    if self.path != "/render":
      self._send_json(404, {"error": f"unknown path {self.path}"})
      return
    try:
      length = int(self.headers.get("Content-Length", "0"))
      req = json.loads(self.rfile.read(length) or b"{}")
      c2w = np.asarray(req["c2w"], np.float32)
      out = self.session.render(
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
      if "path" in req:
        spec = video_lib.named_path(
            req["path"], self.session.data,
            render_idx=int(req.get("render_idx", -1)),
            num_frames=req.get("num_frames"))
        c2ws, idxs = spec["c2ws"], spec["frame_idxs"]
      else:
        c2ws = [np.asarray(p, np.float32) for p in req["c2ws"]]
        idxs = [int(i) for i in req["frame_idxs"]]
      frames = self.session.render_path(
          c2ws, idxs, stride=int(req.get("stride", 1)),
          layer=req.get("layer", "rgb"))
      body = video_lib.encode_mp4(frames, fps=float(req.get("fps", 24.0)))
      self._send(200, body, "video/mp4")
    except (KeyError, ValueError, TypeError) as e:
      self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
    except Exception as e:  # noqa: BLE001 — keep the server alive
      self._send_json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(session: RenderSession, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
  """Build (not start) the HTTP server; port=0 picks a free port."""
  handler = type("BoundHandler", (_Handler,), {"session": session})
  return ThreadingHTTPServer((host, port), handler)


def serve_forever(session: RenderSession, host: str, port: int,
                  ready: Optional[threading.Event] = None) -> None:
  httpd = make_server(session, host, port)
  if ready is not None:
    ready.set()
  print(f"dynibar_tpu renderer serving on http://{host}:{httpd.server_port}")
  httpd.serve_forever()


def main():
  import argparse
  from dynibar_tpu.cli.train import parse_args as parse_config_args

  ap = argparse.ArgumentParser(add_help=False)
  ap.add_argument("--host", default="127.0.0.1")
  ap.add_argument("--port", type=int, default=8008)
  ap.add_argument("--no_warmup", action="store_true")
  args, rest = ap.parse_known_args()

  import sys
  sys.argv = [sys.argv[0]] + rest
  config = parse_config_args()
  session = RenderSession(config)
  if not args.no_warmup:
    dt = session.warmup()
    print(f"warmup render (compile) took {dt:.1f}s")
  serve_forever(session, args.host, args.port)


if __name__ == "__main__":
  main()
