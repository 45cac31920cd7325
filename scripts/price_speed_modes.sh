#!/bin/bash
# Price every advertised speed mode in dB on a TRAINED FF checkpoint
# (VERDICT r4 ask #2): run the Nvidia eval protocol on an identical frame
# subset for each rung of the --mode ladder (see eval_ff_synthetic.py) and
# print one JSON line per mode.  Run on an otherwise-idle host; each mode
# compiles its own render program (minutes, cached across re-runs).
#
#   bash scripts/price_speed_modes.sh [CKPT] [FRAMES] [OUT]
set -u
CKPT="${1:-/tmp/dynibar_ff_convergence/ckpt_fftpu10k_B}"
FRAMES="${2:-8}"
OUT="${3:-/tmp/speed_mode_pricing.jsonl}"
cd "$(dirname "$0")/.."
: > "$OUT"
# order: gold anchor first, then the advertised modes (production 17.4k,
# fused_rgb 21.3k) against the r4-table baseline (fused_bf16); exact_bf16
# (prices the kernels vs flax in isolation) last — least load-bearing if
# the session runs out of wall-clock mid-ladder
for mode in exact_f32 fused_bf16 production fused_rgb exact_bf16; do
  echo "=== mode $mode ===" >&2
  timeout 3600 python scripts/eval_ff_synthetic.py \
      --ckpt "$CKPT" --frames "$FRAMES" --mode "$mode" \
      2>"/tmp/speed_mode_${mode}.err" \
    | grep '^{' | tee -a "$OUT"
  [ "${PIPESTATUS[0]}" -ne 0 ] && \
    echo "mode $mode FAILED — see /tmp/speed_mode_${mode}.err" >&2
done
echo "wrote $OUT" >&2
