#!/bin/bash
# Round-5 TPU measurement battery — run when the axon tunnel is healthy.
# Serialized (the tunnel serializes anyway), highest-value first so a
# mid-battery tunnel death still leaves the round's key numbers on disk.
# Logs under /tmp/round5_tpu/.
set -u
OUT=${1:-/tmp/round5_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) ==" | tee -a "$OUT/battery.log"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "   rc=$rc ($(date +%H:%M:%S))" | tee -a "$OUT/battery.log"
  tail -4 "$OUT/$name.log" | sed 's/^/   /' | tee -a "$OUT/battery.log"
}

# 1. full-mode A/B: f32 vs bf16 denoiser compute (VERDICT #4 candidate win)
run ab_full 4000 python tools/ab_step.py '' 'denoiser_compute_dtype=bfloat16'
# 2. cache-mode A/B: same lever on the production-fast path
run ab_cache 3000 env AB_STEP_PRECOMPUTED=1 python tools/ab_step.py '' 'denoiser_compute_dtype=bfloat16'
# 3. replan latency A/B: f32 vs bf16 denoiser (VERDICT #3c device-side)
run replan 2000 python tools/replan_latency.py '' 'denoiser_compute_dtype=bfloat16'
# 4. full-step per-op/per-module attribution (VERDICT #4 profile)
run trace_full 4000 python tools/trace_ops.py 512
# 4. the full driver-style bench (fills ROUND5_NOTES TPU table)
run bench 7200 python bench.py
echo "battery done $(date +%H:%M:%S)" | tee -a "$OUT/battery.log"
