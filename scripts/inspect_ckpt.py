"""Per-parameter-group norms across a series of checkpoints.

Diagnosis tool for the convergence divergence (CONVERGENCE.md): the tpu10k
run collapsed between step 3450-3500 with no schedule boundary nearby.
convergence_run.py now checkpoints every eval interval; this script walks
those snapshots and prints, per top-level parameter group (feature nets,
aggregators, motion MLP, trajectory basis), the global L2 norm and max-abs
so the group that blows up - and the step window it blows up in - is
visible at a glance.

  python scripts/inspect_ckpt.py /tmp/dynibar_convergence/ckpt_tpu10kclip
  python scripts/inspect_ckpt.py <dir> --diff   # also print step-over-step
                                                # update norms per group
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def group_stats(params):
  """{group: (l2, max_abs)} over each top-level entry of the param tree."""
  import jax
  out = {}
  for name, sub in params.items():
    leaves = jax.tree_util.tree_leaves(sub)
    sq = sum(float(np.sum(np.asarray(l, np.float64) ** 2)) for l in leaves)
    mx = max(float(np.max(np.abs(np.asarray(l)))) for l in leaves)
    out[name] = (np.sqrt(sq), mx)
  return out


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("ckpt_dir", help="directory of model_<step> snapshots")
  ap.add_argument("--diff", action="store_true",
                  help="print per-group L2 of the param delta between "
                       "consecutive snapshots")
  args = ap.parse_args()

  import jax
  import orbax.checkpoint as ocp

  def load_as_numpy(path):
    # Template-free restore: orbax needs explicit "give me numpy" restore
    # args for jax.Array leaves saved from another process/topology.
    with ocp.PyTreeCheckpointer() as ckpter:
      meta = ckpter.metadata(path).item_metadata
      meta = meta.tree if hasattr(meta, "tree") else meta
      restore_args = jax.tree_util.tree_map(
          lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
      return ckpter.restore(path, restore_args=restore_args)

  snaps = sorted(d for d in os.listdir(args.ckpt_dir)
                 if d.startswith("model_"))
  if not snaps:
    sys.exit(f"no model_* snapshots under {args.ckpt_dir}")

  prev = None
  header = None
  for snap in snaps:
    payload = load_as_numpy(os.path.join(args.ckpt_dir, snap))
    params = payload["params"]
    step = int(payload.get("step", -1))
    stats = group_stats(params)
    if header is None:
      header = sorted(stats)
      print("step  " + "  ".join(f"{g}(l2/max)" for g in header))
    row = [f"{stats[g][0]:9.3f}/{stats[g][1]:8.3f}" for g in header]
    print(f"{step:6d}  " + "  ".join(row))
    if args.diff and prev is not None:
      import jax
      deltas = []
      for g in header:
        d = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
            params[g], prev[g])
        deltas.append(np.sqrt(sum(float(np.sum(l ** 2))
                                  for l in jax.tree_util.tree_leaves(d))))
      print("  +d   " + "  ".join(f"{d:9.3f}" for d in deltas))
    prev = params


if __name__ == "__main__":
  main()
