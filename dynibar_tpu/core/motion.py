"""Motion-trajectory field: learned DCT basis + coefficient evaluation.

Parity targets in the reference:
  * ``init_dct_basis``   (ibrnet/model.py:18-30)
  * ``compute_traj_pts`` (ibrnet/render_ray.py:361-369)
  * per-render trajectory window logic (render_ray.py:956-995)

TPU-first change: the reference evaluates 7 offsets with a python loop of
small matmuls and dictionary bookkeeping; here the whole window is one
einsum against a dynamically sliced [7, K] basis block.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_dct_basis(num_basis: int, num_frames: int) -> np.ndarray:
  """DCT-II basis, [T, K] (reference model.py:18-30)."""
  t = np.arange(num_frames)[:, None].astype(np.float64)
  k = np.arange(1, num_basis + 1)[None, :].astype(np.float64)
  basis = np.sqrt(2.0 / num_frames) * np.cos(
      np.pi / (2.0 * num_frames) * (2 * t + 1) * k)
  return basis.astype(np.float32)


def zero_tail_coeffs(raw_coeff: jnp.ndarray, n_samples: int) -> jnp.ndarray:
  """Zero the trajectory coefficients of the last 10% samples along the ray
  (reference render_ray.py:961-962) — keeps far samples static."""
  num_last = int(round(n_samples * 0.1))
  if num_last == 0:
    return raw_coeff
  keep = jnp.arange(n_samples) < (n_samples - num_last)
  return raw_coeff * keep[None, :, None].astype(raw_coeff.dtype)


def basis_window(trajectory_basis: jnp.ndarray, frame_idx: jnp.ndarray,
                 window: int = 3) -> jnp.ndarray:
  """Rows [frame_idx-window .. frame_idx+window] of the [T, K] basis.

  frame_idx is a traced int32 scalar.  Rows are gathered individually with
  clamped indices so the window stays *aligned* even when frame_idx is
  within `window` of the sequence ends (anchor frames can be — the
  curriculum picks anchor_idx = ref_idx ± k with ref_idx >= 3, so
  anchor_idx can reach 0).  A dynamic_slice would shift the whole window at
  the boundary and silently evaluate every offset against wrong basis rows;
  with per-row clamping only the out-of-range offsets (which the view and
  pair validity masks already exclude) read a clamped row.
  """
  t = trajectory_basis.shape[0]
  offsets = jnp.arange(-window, window + 1, dtype=jnp.int32)
  rows = jnp.clip(frame_idx.astype(jnp.int32) + offsets, 0, t - 1)
  return jnp.take(trajectory_basis, rows, axis=0)


def traj_points_window(raw_coeff: jnp.ndarray, basis_win: jnp.ndarray
                       ) -> jnp.ndarray:
  """Trajectory points at every offset of the window.

  raw_coeff: [R, S, 3*K] (x coeffs, then y, then z — reference layout
  render_ray.py:964-967); basis_win: [O, K].
  Returns [R, S, O, 3].
  """
  r, s, three_k = raw_coeff.shape
  k = basis_win.shape[1]
  assert three_k == 3 * k
  # [R, S, 3, K] with dim-2 ordered (x, y, z)
  coeff = raw_coeff.reshape(r, s, 3, k)
  return jnp.einsum("rsck,ok->rsoc", coeff, basis_win,
                    precision=jax.lax.Precision.HIGHEST)


def displaced_points(pts: jnp.ndarray, traj_win: jnp.ndarray,
                     view_offset_idx: jnp.ndarray, window: int = 3
                     ) -> jnp.ndarray:
  """Per-view motion-displaced sample points.

  pts: [R, S, 3] reference-time points; traj_win: [R, S, O, 3];
  view_offset_idx: [V] int index into the window (offset + window; virtual
  views use index=window i.e. zero displacement — reference
  render_ray.py:981-990).

  Returns [V, R, S, 3].
  """
  traj_sel = jnp.take(traj_win, view_offset_idx, axis=2)   # [R, S, V, 3]
  disp = traj_sel - traj_win[:, :, window:window + 1, :]   # [R, S, V, 3]
  return jnp.transpose(disp, (2, 0, 1, 3)) + pts[None]


def scene_flow_seq(traj_win: jnp.ndarray) -> jnp.ndarray:
  """Consecutive-offset scene flows for regularization.

  Parity with reference render_ray.py:1101-1105: offsets [-2..3] minus the
  previous offset -> [6, R, S, 3].
  """
  diff = traj_win[:, :, 1:, :] - traj_win[:, :, :-1, :]    # [R, S, O-1, 3]
  return jnp.transpose(diff, (2, 0, 1, 3))


def expected_scene_flow(weights: jnp.ndarray, traj_win: jnp.ndarray,
                        step: int, window: int = 3) -> jnp.ndarray:
  """max(E[traj(+step)-traj(0)], E[traj(-step)-traj(0)]) under render weights
  (reference render_ray.py:1086-1096 uses step=1; :585-595 uses step=2)."""
  base = traj_win[:, :, window, :]
  sf_p = jnp.sum(weights[..., None] * (traj_win[:, :, window + step, :] - base),
                 axis=-2)
  sf_m = jnp.sum(weights[..., None] * (traj_win[:, :, window - step, :] - base),
                 axis=-2)
  return jnp.maximum(sf_p, sf_m)
