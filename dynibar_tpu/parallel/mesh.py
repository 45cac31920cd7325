"""Mesh + sharding layer.

The reference scales with nn.DataParallel over the ray/view batch dimension
plus an optional NCCL data-sharding mode (SURVEY.md §2.3).  The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` with a single ``data`` axis that
shards the *ray* dimension of every per-ray array; parameters and source
images are replicated.  XLA then compiles the gradient mean into an
all-reduce over ICI — the semantics the reference's distributed mode was
missing (it sharded data but never averaged gradients; we replicate the
capability, not the bug — SURVEY.md §2.3).

A second mesh axis can be added for multi-slice DCN data-parallel without
touching the model code: only `shard_ray_batch`'s PartitionSpec changes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# keys whose leading axis is the ray axis
RAY_SHARDED_KEYS = (
    "ray_o", "ray_d", "uv_grid", "rgb", "disp", "motion_mask", "static_mask",
)
# keys whose *second* axis is the ray axis
RAY_SHARDED_AXIS1_KEYS = ("flows", "flow_masks")


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
  devices = list(devices if devices is not None else jax.devices())
  return Mesh(np.array(devices), (axis_name,))


def ray_batch_shardings(mesh: Mesh, rb: Dict[str, Any],
                        axis_name: str = "data") -> Dict[str, NamedSharding]:
  """Per-key shardings: per-ray arrays sharded, everything else replicated."""
  out = {}
  for k in rb:
    if k in RAY_SHARDED_KEYS:
      spec = P(axis_name)
    elif k in RAY_SHARDED_AXIS1_KEYS:
      spec = P(None, axis_name)
    else:
      spec = P()
    out[k] = NamedSharding(mesh, spec)
  return out


def shard_ray_batch(mesh: Mesh, rb: Dict[str, Any],
                    axis_name: str = "data") -> Dict[str, jax.Array]:
  """Place a host ray batch onto the mesh with ray-axis sharding.

  Single-process: a plain device_put per key.  Multi-controller (one
  process per host, config.distributed): global arrays are assembled from
  per-process local data — the global ray axis is process_count × local
  N_rand, with each process contributing DISJOINT ray positions of the
  SAME target view.  Replicated keys (source stacks, cameras, scalars)
  must be bit-identical across processes —
  ``jax.make_array_from_process_local_data`` requires replica hosts to
  pass identical data (XLA may serve any replica's copy) — which the data
  layer guarantees by drawing view-level choices from a process-shared
  stream and only the pixel positions from a per-process stream
  (``data/factory.fold_pixel_rng``).
  """
  shardings = ray_batch_shardings(mesh, rb, axis_name)
  if jax.process_count() == 1:
    return {k: jax.device_put(v, shardings[k]) for k, v in rb.items()}
  return {k: jax.make_array_from_process_local_data(
      shardings[k], np.asarray(v)) for k, v in rb.items()}


def replicate(mesh: Mesh, tree):
  """Fully replicate a pytree (parameters, optimizer state) on the mesh.

  Multi-controller: assembled from per-process local values (which are
  identical across ranks for params/opt state — same seed, same updates).
  """
  sharding = NamedSharding(mesh, P())
  if jax.process_count() == 1:
    return jax.device_put(tree, sharding)
  return jax.tree_util.tree_map(
      lambda x: jax.make_array_from_process_local_data(
          sharding, np.asarray(x)), tree)


def training_mesh(config) -> Optional[Mesh]:
  """Mesh for the production training drivers (cli.train / cli.train_ff).

  The reference's ``--distributed`` launched one torch process per GPU over
  NCCL (train.py:35-45); here a single controller drives every addressable
  chip through one jit-compiled step with XLA-inserted gradient all-reduce.

  config.distributed=True first calls ``jax.distributed.initialize()`` so
  multi-host jobs (env-configured coordinator, one process per host) see
  the global device set; config.mesh_shape picks the data-axis size:
  "auto" = every addressable device (mesh only when more than one),
  "N" = the first N devices, "1" = force single-device.

  Returns None when a mesh would be trivial — the drivers then run the
  plain single-device path.
  """
  if getattr(config, "distributed", False):
    jax.distributed.initialize()
  devices = jax.devices()
  spec = str(getattr(config, "mesh_shape", "auto")).strip()
  n = len(devices) if spec in ("auto", "") else int(spec)
  if n <= 1:
    return None
  if n > len(devices):
    raise ValueError(f"mesh_shape={n} but only {len(devices)} devices")
  return make_mesh(devices[:n])
