"""Checkpoint save / auto-resume.

Parity with the reference's resume semantics (model.py:424-500): periodic
"latest" snapshots containing params + optimizer state + step, auto-reload of
the newest checkpoint in the experiment folder, explicit-path override, and
no_load_opt / no_load_scheduler equivalents.  Storage is Orbax.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
  return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(out_folder: str, step: int, params: Any,
                    opt_state: Any = None, keep: int = 3,
                    name: str = "model") -> str:
  """Write params (+ optimizer state) under out_folder/<name>_<step>."""
  out_folder = _abs(out_folder)
  os.makedirs(out_folder, exist_ok=True)
  path = os.path.join(out_folder, f"{name}_{step:08d}")
  # store host numpy leaves: device arrays serialize with their sharding,
  # and a template-less restore in a fresh process (render/serve CLIs via
  # resume_from) then fails with "sharding ... Got None"; numpy leaves
  # restore anywhere, on any topology
  params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
  payload = {"params": params, "step": np.int32(step)}
  if opt_state is not None:
    payload["opt_state"] = jax.tree_util.tree_map(
        np.asarray, jax.device_get(opt_state))
  with ocp.PyTreeCheckpointer() as ckpter:
    ckpter.save(path, payload, force=True)
  # prune old snapshots of THIS name only (exact <name>_<digits> match:
  # "model_" is a prefix of "model_no-vv_", and the no-vv dir sorts after
  # every numeric step, so prefix matching would both mis-prune and make
  # latest_checkpoint("model") return the frozen no-vv snapshot forever)
  snaps = _snapshots(out_folder, name)
  for stale in snaps[:-keep]:
    import shutil
    shutil.rmtree(os.path.join(out_folder, stale), ignore_errors=True)
  return path


def _snapshots(out_folder: str, name: str) -> list:
  """Snapshot dirs named exactly <name>_<digits>, sorted by step."""
  pat = re.compile(re.escape(name) + r"_(\d+)$")
  return sorted((d for d in os.listdir(out_folder) if pat.match(d)),
                key=lambda d: int(pat.match(d).group(1)))


def latest_checkpoint(out_folder: str, name: str = "model") -> Optional[str]:
  out_folder = _abs(out_folder)
  if not os.path.isdir(out_folder):
    return None
  snaps = _snapshots(out_folder, name)
  return os.path.join(out_folder, snaps[-1]) if snaps else None


def load_checkpoint(path: str, template: Any = None) -> Any:
  with ocp.PyTreeCheckpointer() as ckpter:
    if template is not None:
      return ckpter.restore(_abs(path), item=template)
    return ckpter.restore(_abs(path))


def resume_from(out_folder: str, ckpt_path: str = "",
                no_reload: bool = False, name: str = "model",
                template: Any = None) -> Tuple[Optional[Any], int]:
  """Auto-resume (reference model.py:468-500): explicit path wins, else the
  newest snapshot in out_folder; returns (payload or None, start_step).

  Pass ``template`` (a payload-shaped pytree, e.g. {'params': ...,
  'opt_state': ..., 'step': 0}) to restore *typed* pytrees — optax states
  are namedtuples that a template-less restore would flatten to dicts.
  """
  if no_reload:
    return None, 0
  path = ckpt_path if ckpt_path and os.path.exists(_abs(ckpt_path)) else (
      latest_checkpoint(out_folder, name))
  if path is None:
    return None, 0
  payload = load_checkpoint(path, template)
  return payload, int(payload["step"])
