#!/bin/bash
# Round-3 TPU work chain: run after the in-flight convergence run exits.
#  1. per-phase frame-time profile (VERDICT r2 ask #3)
#  2. roofline verdict on the eval chunk (VERDICT r2 weak #4)
#  3. strip_train convergence comparison (VERDICT r2 ask #6)
# Each phase writes JSON to /tmp; convergence_run.py appends its own row
# to CONVERGENCE.md.  Keep the host otherwise idle (DESIGN.md §7).
set -u
cd "$(dirname "$0")/.."

CONV_PID="${1:-}"
if [ -n "$CONV_PID" ]; then
  echo "[chain] waiting for convergence run pid $CONV_PID"
  tail --pid="$CONV_PID" -f /dev/null
  echo "[chain] convergence run exited"
fi

echo "[chain] frame phases"
timeout 2400 python scripts/profile_frame_phases.py \
  > /tmp/frame_phases_r3.json 2> /tmp/frame_phases_r3.err
echo "[chain] frame phases rc=$?"

echo "[chain] roofline"
timeout 2400 python scripts/roofline.py \
  > /tmp/roofline_r3.json 2> /tmp/roofline_r3.err
echo "[chain] roofline rc=$?"

echo "[chain] train-step breakdown (anchor-branch residual)"
timeout 2400 python scripts/profile_train_breakdown.py \
  > /tmp/train_breakdown_r3.log 2>&1
echo "[chain] breakdown rc=$?"

echo "[chain] strip_train convergence run"
timeout 14400 python scripts/convergence_run.py \
  --steps 10000 --init_decay_epoch 80 --eval_every 500 --clip 1.0 \
  --strip --tag tpu10kstrip \
  > /tmp/conv_tpu10kstrip.log 2>&1
echo "[chain] strip run rc=$?"
echo "[chain] done"
