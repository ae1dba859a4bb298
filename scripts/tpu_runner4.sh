#!/bin/bash
# Round-4 probe-gated runner: before each section, verify the tunnel round-
# trips a tiny matmul (300 s cap). While the tunnel is down, sleep-retry
# instead of burning section timeouts (the 2026-08-20 tunnel flaps: ~10 min
# windows between stalls). Sections are listed in priority order and each
# runs AT MOST once (touch-file dedup), so re-invoking resumes where it
# left off.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r4.log}
DONE=/tmp/tpu_r4_done
mkdir -p "$DONE"
export MISTRALRS_CACHE_DIR=/tmp/mistralrs_xla_cache

probe() {
  timeout 300 python -c "
import jax, numpy as np
x = jax.numpy.ones((8,8), jax.numpy.bfloat16)
np.asarray(x @ x)
print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}

wait_tunnel() {
  until probe; do
    echo "tunnel down $(date -u +%H:%M:%S); retry in 120s" >> "$LOG"
    sleep 120
  done
}

sec() {
  local name=$1 tmo=$2; shift 2
  [ -e "$DONE/$name" ] && return 0
  wait_tunnel
  echo "=== $name ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $name exit=$rc ($(date -u +%H:%M:%S)) ---" >> "$LOG"
  # only mark done on success or real failure; timeout (124) retries on
  # the next invocation once the tunnel is back
  [ "$rc" != 124 ] && touch "$DONE/$name"
}

touch "$DONE/kernel_gate"   # passed 10:50:51 (12 passed, 558 s)
sec step_decompose 1800 python scripts/step_decompose.py
sec bench 900 python bench.py
sec layer_decompose2 900 python scripts/layer_decompose2.py
sec ss_ab 2400 python scripts/ss_ab.py
sec group_ab 1500 python scripts/group_ab.py
sec unroll_ab 1500 python scripts/unroll_ab.py
sec step_decompose_b32 1500 python scripts/step_decompose.py --batch32
sec longctx_ab 2400 python scripts/longctx_ab.py
sec ragged_ab 900 python scripts/ragged_ab.py
sec q5k_int8_ab 900 python scripts/dequant_ab3.py --q5k-int8
echo "=== runner4 pass complete ($(date -u +%H:%M:%S)) ===" >> "$LOG"
sec superscan_ab 2400 python scripts/superscan_ab.py
echo "=== runner4 appendix done ($(date -u +%H:%M:%S)) ===" >> "$LOG"
# ragged backend end-to-end serving A/B (kernel won 1.20x at 2k span)
sec bench_ragged 900 env MISTRALRS_ATTN_BACKEND=ragged python bench.py
echo "=== runner4 appendix2 done ($(date -u +%H:%M:%S)) ===" >> "$LOG"
sec profile_step 1200 python scripts/profile_step.py
sec profile_step_b32 1200 python scripts/profile_step.py --batch32
echo "=== runner4 appendix3 done ($(date -u +%H:%M:%S)) ===" >> "$LOG"
