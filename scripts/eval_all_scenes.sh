#!/bin/bash
# Full Nvidia Dynamic Scenes suite: every per-scene config through
# cli.eval_nvidia, timed, with a combined metrics table at the end.
#
#   bash scripts/eval_all_scenes.sh <folder_path> <ckpt_root> [out_dir]
#
# <ckpt_root> holds the released checkpoints unpacked as
#   <ckpt_root>/<scene>/coarse.pth and <ckpt_root>/<scene>/fine.pth
# (or leave "" to evaluate whatever orbax checkpoint each config's
# out_folder resolves to).  On a multi-chip host the mesh is picked up
# automatically (mesh_shape=auto); the <1 h north star is the total
# wall-clock this script prints at the end on a v5e-8.
set -u
FOLDER=${1:?folder_path with the Nvidia scenes}
CKPTS=${2:-}
OUT=${3:-/tmp/dynibar_eval}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

SCENES="balloon1 balloon2 dynamicFace jumping playground skating truck umbrella"
t_start=$(date +%s)
for s in $SCENES; do
  args=(--config "configs_nvidia/eval_${s}_long.txt"
        --folder_path "$FOLDER"
        --results_json "$OUT/${s}.json")
  if [ -n "$CKPTS" ]; then
    args+=(--coarse_ckpt "$CKPTS/$s/coarse.pth"
           --fine_ckpt "$CKPTS/$s/fine.pth")
  fi
  echo "=== $s ==="
  t0=$(date +%s)
  python -m dynibar_tpu.cli.eval_nvidia "${args[@]}" 2>&1 | tail -3
  echo "--- $s took $(( $(date +%s) - t0 ))s"
done
echo "=== suite wall-clock: $(( $(date +%s) - t_start ))s ==="

python - "$OUT" <<'PY'
import json, os, sys
out = sys.argv[1]
rows = {}
for f in sorted(os.listdir(out)):
    if f.endswith(".json"):
        data = json.load(open(os.path.join(out, f)))
        for scene, table in data.items():
            if scene != "mean":
                rows[scene] = table
if rows:
    print(f"{'scene':<14}" + "".join(
        f"{r+'-'+m:>16}" for r in ("full", "dynamic", "static")
        for m in ("psnr", "ssim", "lpips")))
    for scene, t in rows.items():
        print(f"{scene:<14}" + "".join(
            f"{t[r][m]:>16.4f}" for r in ("full", "dynamic", "static")
            for m in ("psnr", "ssim", "lpips")))
    n = len(rows)
    print(f"{'mean':<14}" + "".join(
        f"{sum(t[r][m] for t in rows.values())/n:>16.4f}"
        for r in ("full", "dynamic", "static")
        for m in ("psnr", "ssim", "lpips")))
PY
