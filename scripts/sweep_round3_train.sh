#!/bin/bash
# Round-3 training-kernel sweep (train-step-only bench, DYNIBAR_BENCH_EVAL=0;
# the eval path is unchanged by these kernels and was measured separately).
# MUST run on an otherwise-idle host: the single host CPU feeds the remote
# chip, and concurrent load inflates the step time by up to 4x (measured).
#
#   bash scripts/sweep_round3_train.sh 2>&1 | tee /tmp/sweep_r3.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo "### $*"
  timeout 2400 env DYNIBAR_BENCH_EVAL=0 "$@" python bench.py 2>&1 \
    | grep -v WARNING | tail -1
}

# 0. baseline re-measure (split dy+st backward, default config)
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

echo "### done — update DESIGN.md par.3 and flip defaults for the winners"
