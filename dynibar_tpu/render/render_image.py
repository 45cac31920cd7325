"""Full-image rendering via ray chunking (single-chip or mesh-sharded).

Rebuild of the reference's chunked render loop (ibrnet/render_image.py:9-439)
with a TPU-first structure:

  * feature maps are encoded once per frame, not per chunk;
  * the per-chunk render function is jit-compiled once — rays are padded to
    a whole number of fixed-shape chunks (the reference truncates instead);
  * chunk outputs stay on device until the final reshape — the reference's
    per-chunk ``.cpu()`` transfer is exactly the host↔device ping-pong a TPU
    pipeline must avoid;
  * multi-chip: per-ray arrays are reshaped to [n_chunks, chunk] and the
    chunk axis is sharded over the mesh's ``data`` axis, so every device
    renders a stripe of every chunk (the v5e-8 eval path, BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynibar_tpu.config import RenderSettings
from dynibar_tpu.core.cameras import pixel_rays, split_camera
from dynibar_tpu.render.render_rays import render_rays_mono, render_rays_mv

# per-ray keys (axis 0 = rays); everything else is broadcast to every chunk
_PER_RAY_KEYS = ("ray_o", "ray_d", "uv_grid", "rgb", "disp", "motion_mask",
                 "static_mask")
_PER_RAY_AXIS1_KEYS = ("flows", "flow_masks")


def full_image_ray_batch(rb_template: Dict[str, Any], camera,
                         render_stride: int = 1) -> Dict[str, Any]:
  """Expand a ray-batch template to all pixels of `camera`.

  Keeps the view stacks / scalars of `rb_template`, replaces per-ray fields
  with the full pixel grid of the target camera (reference
  sample_ray.py:165-235 ``get_all``).
  """
  h, w, k, c2w = split_camera(camera)
  h, w = int(h), int(w)
  ray_o, ray_d, uv = pixel_rays(h, w, k, c2w, stride=render_stride)
  rb = dict(rb_template)
  rb["ray_o"], rb["ray_d"], rb["uv_grid"] = ray_o, ray_d, uv
  rb["camera"] = camera
  for key in _PER_RAY_KEYS:
    if key not in ("ray_o", "ray_d", "uv_grid") and key in rb:
      del rb[key]
  for key in _PER_RAY_AXIS1_KEYS:
    rb.pop(key, None)
  return rb


def _chunked_batches(rb: Dict[str, Any], chunk_size: int,
                     mesh=None, axis_name: str = "data"):
  """Pad rays to whole chunks, reshape per-ray arrays to [n_chunks, chunk],
  optionally shard the chunk axis over the mesh.  Returns (rb', n_chunks,
  n_rays)."""
  n_rays = rb["ray_o"].shape[0]
  if mesh is not None:
    n_dev = int(np.prod(list(mesh.shape.values())))
    assert chunk_size % n_dev == 0, (
        f"chunk_size {chunk_size} must divide by mesh size {n_dev}")
  n_pad = (-n_rays) % chunk_size
  out = dict(rb)
  for k in _PER_RAY_KEYS:
    if k in out:
      pad = [(0, n_pad)] + [(0, 0)] * (out[k].ndim - 1)
      v = jnp.pad(out[k], pad, mode="edge")
      out[k] = v.reshape((-1, chunk_size) + v.shape[1:])
  n_chunks = (n_rays + n_pad) // chunk_size
  if mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec as P
    for k in out:
      if k in _PER_RAY_KEYS:
        spec = P(None, axis_name)
      else:
        spec = P()
      out[k] = jax.device_put(out[k], NamedSharding(mesh, spec))
  return out, n_chunks, n_rays


def _run_chunks(render_chunk, params, rb_c, extra, n_chunks, n_rays,
                exact_chunk=None, stats: Optional[dict] = None,
                serialize: bool = False):
  """Run every chunk; when a chunk reports a sampling-coverage miss and an
  `exact_chunk` renderer is supplied, transparently re-render that chunk
  through the exact per-sample-gather program (auto-exact fallback: the
  fast path stays bit-correct end to end, misses only cost one re-render
  of their chunk).

  serialize=True (set when the inputs are mesh-sharded) blocks each chunk
  before dispatching the next: concurrently in-flight executions of a
  sharded program can interleave their collectives at the XLA:CPU
  rendezvous — devices split between different executions' all-reduce /
  collective-permute, the rendezvous times out, and the runtime SIGABRTs
  the process.  One execution in flight at a time cannot desync.
  """
  if serialize:
    outs, covs = [], []
    for i in range(n_chunks):
      o, c = render_chunk(params, rb_c, *extra, i)
      o = jax.block_until_ready(o)
      outs.append(o)
      covs.append(c)
  else:
    # dispatch every chunk before inspecting coverage: the bool() sync
    # would otherwise serialize the async chunk pipeline
    outs, covs = zip(*[render_chunk(params, rb_c, *extra, i)
                       for i in range(n_chunks)])
    outs = list(outs)
  n_fallback = 0
  if exact_chunk is not None:
    for i, cov in enumerate(covs):
      if not bool(cov):
        outs[i], _ = exact_chunk(params, rb_c, *extra, i)
        if serialize:
          outs[i] = jax.block_until_ready(outs[i])
        n_fallback += 1
  if stats is not None:
    stats["chunks"] = n_chunks
    stats["exact_fallback_chunks"] = n_fallback
  return jax.tree_util.tree_map(
      lambda *xs: np.concatenate([np.asarray(x) for x in xs],
                                 axis=0)[:n_rays], *outs)


def _take_chunk(rb_c: Dict[str, Any], i) -> Dict[str, Any]:
  out = {}
  for k, v in rb_c.items():
    out[k] = v[i] if k in _PER_RAY_KEYS else v
  return out


def _to_images(merged: Dict[str, Dict[str, np.ndarray]], height: int,
               width: int) -> Dict[str, Dict[str, np.ndarray]]:
  result = {}
  for name, fields in merged.items():
    imgs = {k: v.reshape((height, width) + v.shape[1:])
            for k, v in fields.items()}
    # zero rgb where no valid observations (reference render_image.py:384-411)
    imgs["rgb"] = imgs["rgb"] * (imgs["mask"][..., None] > 0)
    result[name] = imgs
  return result


def _keep_mono(ret, train_view: bool):
  keep = {}
  for name in ("outputs_coarse_ref", "outputs_coarse_st"):
    o = ret[name]
    keep[name] = {"rgb": o["rgb"], "depth": o["depth"],
                  "mask": o["mask"].astype(jnp.float32)}
    if "rgb_static" in o:
      keep[name]["rgb_static"] = o["rgb_static"]
      keep[name]["rgb_dy"] = o["rgb_dy"]
  if train_view:
    o = ret["outputs_coarse_ref"]
    keep["outputs_coarse_ref"]["exp_sf"] = o["exp_sf"]
    # [V, R, 2] -> per-ray leading axis for the chunk concat
    keep["outputs_coarse_ref"]["render_flows"] = jnp.transpose(
        o["render_flows"], (1, 0, 2))
    a = ret["outputs_coarse_anchor"]
    keep["outputs_coarse_anchor"] = {
        "rgb": a["rgb"], "depth": a["depth"],
        "mask": a["mask"].astype(jnp.float32),
        "occ_weight_map": a["occ_weight_map"]}
  return keep


def _keep_ff(ret):
  keep = {}
  for name in ("outputs_coarse_ref", "outputs_fine_ref"):
    o = ret[name]
    keep[name] = {"rgb": o["rgb"], "depth": o["depth"],
                  "mask": o["mask"].astype(jnp.float32)}
  return keep


# jitted chunk renderers are cached per (model, cfg, det): a fresh closure
# per frame would retrace on every rendered image of an eval loop
@functools.lru_cache(maxsize=16)
def _mono_chunk_fn(model, cfg: RenderSettings, det: bool,
                   train_view: bool = False):
  """train_view=True renders the full training program (cross-time anchor
  branch included) and keeps the observability fields the reference's
  log_view_to_tb panels need (train.py:576-762): anchor rgb/depth, the
  occlusion-weight map, expected-scene-flow and rendered flows."""
  @jax.jit
  def render_chunk(params, rb_chunked, featmaps, i):
    chunk = _take_chunk(rb_chunked, i)
    cov = []
    ret = render_rays_mono(model, params, chunk, featmaps, cfg,
                           is_train=train_view, det=det, cov_out=cov,
                           needs_grad=False)
    return (_keep_mono(ret, train_view),
            jnp.all(jnp.stack(cov)) if cov else jnp.asarray(True))
  return render_chunk


@functools.lru_cache(maxsize=16)
def _ff_chunk_fn(model, cfg: RenderSettings, det: bool):
  @jax.jit
  def render_chunk(params, rb_chunked, cf, ff, i):
    chunk = _take_chunk(rb_chunked, i)
    cov = []
    ret = render_rays_mv(model, params, chunk, cf, ff, cfg, det=det,
                         cov_out=cov)
    return (_keep_ff(ret),
            jnp.all(jnp.stack(cov)) if cov else jnp.asarray(True))
  return render_chunk


# whole-frame renderers: lax.map over the chunk axis inside ONE jit — one
# dispatch per frame instead of one per chunk.  On the remote-TPU tunnel the
# per-dispatch latency dominated the frame time (39 s -> 11 s at 288x512 by
# merely growing chunks; the scan removes the remaining per-call overhead
# while keeping memory at chunk granularity).
@functools.lru_cache(maxsize=16)
def _mono_scan_fn(model, cfg: RenderSettings, det: bool,
                  train_view: bool = False):
  @jax.jit
  def render_frame(params, rb_chunked, featmaps):
    per_ray = {k: v for k, v in rb_chunked.items() if k in _PER_RAY_KEYS}
    fixed = {k: v for k, v in rb_chunked.items() if k not in _PER_RAY_KEYS}

    def body(chunk_per_ray):
      chunk = {**fixed, **chunk_per_ray}
      cov = []
      ret = render_rays_mono(model, params, chunk, featmaps, cfg,
                             is_train=train_view, det=det, cov_out=cov,
                             needs_grad=False)
      return (_keep_mono(ret, train_view),
              jnp.all(jnp.stack(cov)) if cov else jnp.asarray(True))

    return jax.lax.map(body, per_ray)
  return render_frame


@functools.lru_cache(maxsize=16)
def _ff_scan_fn(model, cfg: RenderSettings, det: bool):
  @jax.jit
  def render_frame(params, rb_chunked, cf, ff):
    per_ray = {k: v for k, v in rb_chunked.items() if k in _PER_RAY_KEYS}
    fixed = {k: v for k, v in rb_chunked.items() if k not in _PER_RAY_KEYS}

    def body(chunk_per_ray):
      chunk = {**fixed, **chunk_per_ray}
      cov = []
      ret = render_rays_mv(model, params, chunk, cf, ff, cfg, det=det,
                           cov_out=cov)
      return (_keep_ff(ret),
              jnp.all(jnp.stack(cov)) if cov else jnp.asarray(True))

    return jax.lax.map(body, per_ray)
  return render_frame


def _run_scan(frame_fn, params, rb_c, extra, n_rays, exact_chunk=None,
              stats: Optional[dict] = None):
  """One-dispatch frame render + host-side exact fallback for the (rare)
  chunks whose fast-path sampling reports a coverage miss."""
  outs, covs = frame_fn(params, rb_c, *extra)
  covs_host = np.asarray(covs)
  outs = jax.tree_util.tree_map(np.asarray, outs)
  n_fallback = 0
  if exact_chunk is not None and not covs_host.all():
    # device-array views are read-only; copy once before patching rows
    outs = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), outs)
    for i in np.nonzero(~covs_host)[0]:
      patch, _ = exact_chunk(params, rb_c, *extra, int(i))

      def _set_row(big, small, _i=int(i)):
        big[_i] = np.asarray(small)
        return big

      outs = jax.tree_util.tree_map(_set_row, outs, patch)
      n_fallback += 1
  if stats is not None:
    stats["chunks"] = int(covs_host.shape[0])
    stats["exact_fallback_chunks"] = n_fallback
  return jax.tree_util.tree_map(
      lambda x: x.reshape((-1,) + x.shape[2:])[:n_rays], outs)


def _exact_cfg(cfg: RenderSettings) -> RenderSettings:
  return dataclasses.replace(cfg, strip_sampling=False)


def render_image_mono(model, params, rb: Dict[str, Any], featmaps,
                      cfg: RenderSettings, chunk_size: int,
                      height: int, width: int, det: bool = True,
                      mesh=None, stats: Optional[dict] = None,
                      train_view: bool = False, scan_chunks: bool = True
                      ) -> Dict[str, Dict[str, np.ndarray]]:
  """Render a full target view with the monocular model.

  Returns {'outputs_coarse_ref': {...}, 'outputs_coarse_st': {...}} with
  [H, W, ·] arrays.  With strip_sampling + strip_auto_exact (default),
  chunks whose fast-path sampling reports a coverage miss are re-rendered
  through the exact gather program; `stats` (optional dict) receives
  {'chunks', 'exact_fallback_chunks'}.
  """
  rb_c, n_chunks, n_rays = _chunked_batches(rb, chunk_size, mesh)
  exact = (_mono_chunk_fn(model, _exact_cfg(cfg), det, train_view)
           if cfg.strip_sampling and cfg.strip_auto_exact else None)
  if scan_chunks:
    # under a mesh the scan path is also the SAFE path: one compiled
    # program owns every chunk's collectives (see _run_chunks docstring)
    frame_fn = _mono_scan_fn(model, cfg, det, train_view)
    merged = _run_scan(frame_fn, params, rb_c, (featmaps,), n_rays,
                       exact_chunk=exact, stats=stats)
  else:
    render_chunk = _mono_chunk_fn(model, cfg, det, train_view)
    merged = _run_chunks(render_chunk, params, rb_c, (featmaps,), n_chunks,
                         n_rays, exact_chunk=exact, stats=stats,
                         serialize=mesh is not None)
  return _to_images(merged, height, width)


def render_image_ff(model, params, rb: Dict[str, Any], coarse_featmaps,
                    fine_featmaps, cfg: RenderSettings, chunk_size: int,
                    height: int, width: int, det: bool = True,
                    mesh=None, stats: Optional[dict] = None,
                    scan_chunks: bool = True
                    ) -> Dict[str, Dict[str, np.ndarray]]:
  """Render a full target view with the forward-facing (Nvidia) model.

  Auto-exact fallback as in :func:`render_image_mono`.  scan_chunks=True
  (default) renders all chunks in ONE dispatch via lax.map — on a mesh this
  also makes one program own all collectives (no rendezvous races)."""
  rb_c, n_chunks, n_rays = _chunked_batches(rb, chunk_size, mesh)
  exact = (_ff_chunk_fn(model, _exact_cfg(cfg), det)
           if cfg.strip_sampling and cfg.strip_auto_exact else None)
  if scan_chunks:
    frame_fn = _ff_scan_fn(model, cfg, det)
    merged = _run_scan(frame_fn, params, rb_c,
                       (coarse_featmaps, fine_featmaps), n_rays,
                       exact_chunk=exact, stats=stats)
  else:
    render_chunk = _ff_chunk_fn(model, cfg, det)
    merged = _run_chunks(render_chunk, params, rb_c,
                         (coarse_featmaps, fine_featmaps), n_chunks, n_rays,
                         exact_chunk=exact, stats=stats,
                         serialize=mesh is not None)
  return _to_images(merged, height, width)
