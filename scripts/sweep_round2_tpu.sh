#!/bin/bash
# Round-2 pending on-hardware sweeps (run on a REAL TPU chip; each prints
# one JSON line).  Implemented + gradient-verified on CPU; the tunnel was
# down when they landed, so the numbers are still unmeasured.
#
#   bash scripts/sweep_round2_tpu.sh 2>&1 | tee /tmp/sweep_round2.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo "### $*"
  timeout 2400 env "$@" python bench.py 2>&1 | grep -v WARNING | tail -1
}

# 0. baseline re-measure (compile cache warm after the first)
run DYNIBAR_BENCH_TRAIN=1

# 1. static RAY kernel at 256 lanes (V=14 -> v*lanes 3584)
run DYNIBAR_AGG_SPLIT_ST_RAY_VLANES=4096

# 2. three-kernel static split, trunk at 128 then 256 lanes
run DYNIBAR_AGG_ST_BWD3=1
run DYNIBAR_AGG_ST_BWD3=1 DYNIBAR_AGG_SPLIT_ST_VLANES=3584
run DYNIBAR_AGG_ST_BWD3=1 DYNIBAR_AGG_SPLIT_ST_VLANES=3584 \
    DYNIBAR_AGG_SPLIT_ST_RAY_VLANES=4096

# 3. strip_train: Pallas sampler forward in the train step
run DYNIBAR_BENCH_TRAIN_STRIP=1
run DYNIBAR_BENCH_TRAIN_STRIP=1 DYNIBAR_AGG_ST_BWD3=1

echo "### done — update DESIGN.md §3 and flip defaults for the winners"
