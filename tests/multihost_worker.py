"""Subprocess body for the 2-process multi-host simulation test.

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 4 virtual CPU devices per
process.  Drives cli.train's real mesh path end-to-end (phase 1 + 2 on the
global 8-device mesh), then runs two more sharded steps manually and prints
a param digest so the parent can assert both ranks stayed bit-identical.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

scene_root, rootdir = sys.argv[1], sys.argv[2]

import jax  # noqa: E402

argv = [
    "train",
    "--folder_path", scene_root,
    "--train_scenes", "tiny",
    "--rootdir", rootdir,
    "--training_height", "32",
    "--num_source_views", "4",
    "--max_range", "8",
    "--num_vv", "2",
    "--init_decay_epoch", "2",
    "--N_rand", "16",
    "--N_samples", "8",
    "--num_basis", "4",
    "--n_iters", "13",
    "--i_print", "6",
    "--i_weights", "12",
    "--i_img", "100000",
    "--workers", "1",
    "--distributed", "true",
    "--mesh_shape", "8",
    "--expname", "mh_smoke",
]
sys.argv = argv
from dynibar_tpu.cli.train import main  # noqa: E402

main()
assert jax.process_count() == 2, jax.process_count()

# ---- manual sharded steps for a cross-rank param digest ----
import numpy as np  # noqa: E402

from dynibar_tpu.cli.train import parse_args  # noqa: E402
from dynibar_tpu.data.factory import create_training_dataset  # noqa: E402
from dynibar_tpu.models.dynibar import MonoModel  # noqa: E402
from dynibar_tpu.parallel.mesh import (make_mesh, replicate,  # noqa: E402
                                       shard_ray_batch)
from dynibar_tpu.train.losses import schedule_weights  # noqa: E402
from dynibar_tpu.train.trainer import (create_train_state,  # noqa: E402
                                       make_train_step)

config = parse_args()
data = create_training_dataset(config)
config.num_frames = data.num_frames
cfg = config.render_settings("mono")
mesh = make_mesh()          # distributed is already initialized by main()
assert mesh.size == 8

model = MonoModel(cfg=cfg, num_frames=data.num_frames)
state, tx = create_train_state(model, config, jax.random.PRNGKey(0))
state = replicate(mesh, state)
step = make_train_step(model, tx, cfg, donate=False)
weights = schedule_weights(config, epoch=2)

np_rng = np.random.RandomState(7)   # same on both ranks: shared view stream
with mesh:
  for i in range(2):
    rb = data.sample_batch(np_rng, config.N_rand)
    state, metrics = step(state, shard_ray_batch(mesh, rb), weights,
                          jax.random.PRNGKey(10 + i))

# the make_array_from_process_local_data contract: replicated keys must be
# bit-identical across ranks; the sharded ray axis must be rank-disjoint
repl_digest = float(np.float64(rb["src_rgbs"]).sum()
                    + np.float64(rb["static_src_rgbs"]).sum()
                    + np.float64(rb["camera"]).sum()
                    + float(rb["ref_frame_idx"]))
ray_digest = float(np.float64(rb["uv_grid"]).sum())

# fully-replicated global arrays are host-readable on every rank
digest = float(sum(
    np.abs(np.asarray(jax.device_get(l), np.float64)).sum()
    for l in jax.tree_util.tree_leaves(state.params)))
print(json.dumps({"rank": jax.process_index(),
                  "n_proc": jax.process_count(),
                  "global_devices": len(jax.devices()),
                  "loss": float(metrics["loss"]),
                  "digest": digest,
                  "repl_digest": repl_digest,
                  "ray_digest": ray_digest}), flush=True)
