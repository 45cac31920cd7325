"""Serving surface: resident session + HTTP server over a synthetic scene."""

import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from dynibar_tpu.config import DynibarConfig
from dynibar_tpu.data.synthetic_scene import write_synthetic_scene
from dynibar_tpu.models.dynibar import MonoModel
from dynibar_tpu.serve.server import make_server
from dynibar_tpu.serve.session import RenderSession


@pytest.fixture(scope="module")
def session(tmp_path_factory):
  root = str(tmp_path_factory.mktemp("scene"))
  write_synthetic_scene(root, "tiny", num_frames=12, height=32, width=48)
  config = DynibarConfig(folder_path=root, train_scenes=["tiny"],
                         training_height=32, num_source_views=4,
                         max_range=8, num_vv=2, N_samples=8, num_basis=4,
                         chunk_size=256)
  # inject random-init params: serving must not require a training run here
  data_cfg = config.render_settings("mono")
  config.num_frames = 12
  model = MonoModel(cfg=data_cfg, num_frames=12)
  params = model.init_params(jax.random.PRNGKey(0))
  return RenderSession(config, params=params, featmap_cache=2)


def test_session_render_and_cache(session):
  pose = np.asarray(session.data.c2w[5])
  out = session.render(pose, 5, stride=4)
  h, w = session.height, session.width
  assert out["rgb"].shape == ((h + 3) // 4, (w + 3) // 4, 3)
  assert out["depth"].shape == out["rgb"].shape[:2]
  assert np.isfinite(out["rgb"]).all()
  # second render of the same frame hits the featmap cache
  before = session.stats["featmap_cache_hits"]
  session.render(pose, 5, stride=4)
  assert session.stats["featmap_cache_hits"] == before + 1
  # layers on demand
  out = session.render(pose, 5, stride=4, layers=True)
  assert out["rgb_dy"].shape == out["rgb"].shape
  assert out["rgb_st"].shape == out["rgb"].shape


def test_http_endpoints(session):
  httpd = make_server(session, "127.0.0.1", 0)
  port = httpd.server_port
  t = threading.Thread(target=httpd.serve_forever, daemon=True)
  t.start()
  base = f"http://127.0.0.1:{port}"
  try:
    health = json.load(urllib.request.urlopen(f"{base}/healthz"))
    assert health["status"] == "ok"
    meta = json.load(urllib.request.urlopen(f"{base}/meta"))
    assert meta["num_frames"] == 12
    assert meta["frame_window"] == [3, 8]

    body = json.dumps({
        "c2w": np.asarray(session.data.c2w[6]).tolist(),
        "frame_idx": 6, "stride": 4, "format": "npy",
    }).encode()
    req = urllib.request.Request(f"{base}/render", data=body,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
      assert resp.status == 200
      arr = np.load(io.BytesIO(resp.read()))
    assert arr.shape == (8, 12, 3)
    assert np.isfinite(arr).all()

    # png path
    body = json.dumps({"c2w": np.asarray(session.data.c2w[6]).tolist(),
                       "frame_idx": 6, "stride": 4}).encode()
    req = urllib.request.Request(f"{base}/render", data=body)
    with urllib.request.urlopen(req) as resp:
      png = resp.read()
    assert png[:4] == b"\x89PNG"

    # malformed request -> 400, server stays alive
    req = urllib.request.Request(f"{base}/render", data=b'{"frame_idx": 1}')
    try:
      urllib.request.urlopen(req)
      raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
      assert e.code == 400
    stats = json.load(urllib.request.urlopen(f"{base}/stats"))
    assert stats["counters"]["renders"] >= 1
  finally:
    httpd.shutdown()


def test_encode_mp4_roundtrip(tmp_path):
  import cv2
  from dynibar_tpu.serve.video import encode_mp4
  frames = [np.full((32, 48, 3), i / 5.0, np.float32) for i in range(5)]
  blob = encode_mp4(frames, fps=10)
  assert len(blob) > 100
  p = tmp_path / "v.mp4"
  p.write_bytes(blob)
  cap = cv2.VideoCapture(str(p))
  assert cap.isOpened()
  n = 0
  while True:
    ok, frame = cap.read()
    if not ok:
      break
    assert frame.shape == (32, 48, 3)
    n += 1
  cap.release()
  assert n == 5


def test_named_paths(session):
  from dynibar_tpu.serve.video import named_path
  stab = named_path("stabilization", session.data)
  assert len(stab["c2ws"]) == session.data.num_frames
  assert stab["frame_idxs"] == list(range(session.data.num_frames))
  # stabilization poses stay orthonormal c2w matrices
  r = np.asarray(stab["c2ws"][4])[:3, :3]
  np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)

  wander = named_path("wander", session.data, render_idx=5, num_frames=7)
  assert len(wander["c2ws"]) == 7
  assert wander["frame_idxs"] == [5] * 7
  with pytest.raises(ValueError):
    named_path("spiralx", session.data)


def _read_multipart(resp, boundary=b"--dynibar-frame"):
  """Parse a multipart/x-mixed-replace body into a list of payloads."""
  blob = resp.read()
  parts = []
  for chunk in blob.split(boundary)[1:]:
    if chunk.startswith(b"--"):
      break  # terminator
    header, _, rest = chunk.partition(b"\r\n\r\n")
    length = int([l for l in header.split(b"\r\n")
                  if l.lower().startswith(b"content-length")][0]
                 .split(b":")[1])
    parts.append(rest[:length])
  return parts


def test_stream_endpoint(session):
  """/stream delivers one multipart PNG part per camera-path pose."""
  httpd = make_server(session, "127.0.0.1", 0)
  t = threading.Thread(target=httpd.serve_forever, daemon=True)
  t.start()
  base = f"http://127.0.0.1:{httpd.server_port}"
  try:
    body = json.dumps({"path": "wander", "render_idx": 5, "num_frames": 3,
                       "stride": 8}).encode()
    req = urllib.request.Request(f"{base}/stream", data=body)
    with urllib.request.urlopen(req) as resp:
      assert resp.status == 200
      assert resp.headers["Content-Type"].startswith(
          "multipart/x-mixed-replace")
      assert resp.headers["X-Frame-Count"] == "3"
      parts = _read_multipart(resp)
    assert len(parts) == 3
    assert all(p[:4] == b"\x89PNG" for p in parts)

    # npy stream round-trips arrays
    body = json.dumps({
        "c2ws": [np.asarray(session.data.c2w[5]).tolist()] * 2,
        "frame_idxs": [5, 5], "stride": 8, "format": "npy"}).encode()
    req = urllib.request.Request(f"{base}/stream", data=body)
    with urllib.request.urlopen(req) as resp:
      parts = _read_multipart(resp)
    arrs = [np.load(io.BytesIO(p)) for p in parts]
    assert len(arrs) == 2 and arrs[0].shape[-1] == 3
    assert all(np.isfinite(a).all() for a in arrs)

    # bad body -> clean 400 before any bytes stream
    req = urllib.request.Request(f"{base}/stream", data=b'{"c2ws": []}')
    try:
      urllib.request.urlopen(req)
      raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
      assert e.code == 400
  finally:
    httpd.shutdown()


def test_multi_scene_registry(tmp_path_factory):
  import jax as _jax
  from dynibar_tpu.config import DynibarConfig as _Cfg
  from dynibar_tpu.serve.registry import SessionRegistry

  root = str(tmp_path_factory.mktemp("scenes"))
  for name in ("alpha", "beta"):
    write_synthetic_scene(root, name, num_frames=10, height=32, width=48)
  config = _Cfg(folder_path=root, train_scenes=["alpha", "beta"],
                training_height=32, num_source_views=4, max_range=8,
                num_vv=2, N_samples=8, num_basis=4, chunk_size=256)
  config.num_frames = 10
  model = MonoModel(cfg=config.render_settings("mono"), num_frames=10)
  params = model.init_params(jax.random.PRNGKey(0))
  reg = SessionRegistry(config, params=params, featmap_cache=2,
                        max_sessions=1)

  assert reg.scenes()["available"] == ["alpha", "beta"]
  s_a = reg.get()                       # default = first scene
  assert s_a.config.train_scenes == ["alpha"]
  assert reg.get("alpha") is s_a        # cached
  s_b = reg.get("beta")
  assert s_b is not s_a
  assert reg.scenes()["loaded"] == ["beta"]   # max_sessions=1 evicted alpha
  with pytest.raises(KeyError):
    reg.get("gamma")

  # scene routing through the HTTP surface
  httpd = make_server(reg, "127.0.0.1", 0)
  t = threading.Thread(target=httpd.serve_forever, daemon=True)
  t.start()
  base = f"http://127.0.0.1:{httpd.server_port}"
  try:
    scenes = json.load(urllib.request.urlopen(f"{base}/scenes"))
    assert scenes["available"] == ["alpha", "beta"]
    meta = json.load(urllib.request.urlopen(f"{base}/meta?scene=beta"))
    assert meta["scene"] == "beta"
    body = json.dumps({"c2w": np.eye(4).tolist(), "frame_idx": 5,
                       "scene": "nope"}).encode()
    req = urllib.request.Request(f"{base}/render", data=body)
    try:
      urllib.request.urlopen(req)
      raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
      assert e.code == 400
  finally:
    httpd.shutdown()
  del _jax


def test_session_render_path_and_video_endpoint(session):
  spec_frames = session.render_path(
      [np.asarray(session.data.c2w[5])] * 2, [5, 5], stride=8)
  assert len(spec_frames) == 2
  assert spec_frames[0].shape[-1] == 3

  httpd = make_server(session, "127.0.0.1", 0)
  t = threading.Thread(target=httpd.serve_forever, daemon=True)
  t.start()
  base = f"http://127.0.0.1:{httpd.server_port}"
  try:
    body = json.dumps({"path": "wander", "render_idx": 5, "num_frames": 3,
                       "stride": 8, "fps": 8}).encode()
    req = urllib.request.Request(f"{base}/video", data=body)
    with urllib.request.urlopen(req) as resp:
      assert resp.status == 200
      assert resp.headers["Content-Type"] == "video/mp4"
      blob = resp.read()
    assert len(blob) > 100

    # explicit pose list
    body = json.dumps({
        "c2ws": [np.asarray(session.data.c2w[5]).tolist()] * 2,
        "frame_idxs": [5, 5], "stride": 8}).encode()
    req = urllib.request.Request(f"{base}/video", data=body)
    with urllib.request.urlopen(req) as resp:
      assert resp.status == 200

    # mismatched lengths -> 400
    body = json.dumps({
        "c2ws": [np.asarray(session.data.c2w[5]).tolist()],
        "frame_idxs": [5, 6]}).encode()
    req = urllib.request.Request(f"{base}/video", data=body)
    try:
      urllib.request.urlopen(req)
      raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
      assert e.code == 400
  finally:
    httpd.shutdown()
