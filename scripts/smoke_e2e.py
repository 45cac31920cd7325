"""End-to-end demo without any dataset: synthetic scene -> train -> resume
-> render a stabilized video, all through the real CLIs.

Runs on the 8-virtual-device CPU backend so it works anywhere:

    python scripts/smoke_e2e.py
"""

import glob
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dynibar_tpu.data.synthetic_scene import write_synthetic_scene  # noqa


def main():
  root = tempfile.mkdtemp(prefix="dynibar_scene_")
  scene = write_synthetic_scene(root, num_frames=12, height=32, width=48)
  out_root = tempfile.mkdtemp(prefix="dynibar_out_")
  common = [
      "--folder_path", root, "--train_dataset", "monocular",
      "--train_scenes", scene, "--rootdir", out_root, "--expname", "smoke",
      "--training_height", "32", "--N_rand", "32", "--N_samples", "16",
      "--num_basis", "4", "--num_source_views", "4", "--max_range", "8",
      "--num_vv", "2", "--init_decay_epoch", "2", "--n_iters", "12",
      "--i_print", "12", "--i_weights", "12", "--i_img", "1000000",
      "--workers", "2", "--chunk_size", "256",
  ]

  from dynibar_tpu.cli.train import main as train_main
  sys.argv = ["train"] + common
  train_main()
  print("== train ok")

  sys.argv = ["train"] + common  # resumes from the saved checkpoint
  sys.argv[sys.argv.index("--n_iters") + 1] = "6"
  train_main()
  print("== resume ok")

  from dynibar_tpu.cli.render_monocular import main as render_main
  sys.argv = ["render"] + common + ["--render_idx", "-1"]
  render_main()
  pngs = glob.glob(os.path.join(out_root, "out", "*", "render_stab",
                                "*.png"))
  assert len(pngs) == 12, pngs
  import imageio.v2 as imageio
  img = imageio.imread(pngs[0])
  assert (img > 0).mean() > 0.5, "rendered frames should not be empty"
  print(f"== render ok: {len(pngs)} frames at {img.shape} in "
        f"{os.path.dirname(pngs[0])}")


if __name__ == "__main__":
  main()
