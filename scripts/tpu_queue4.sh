#!/bin/bash
# Round-4 on-chip queue: runs when the axon tunnel recovers.
# Order: correctness gate first (new fused-epilogue / natural-order kernels
# must lower under the real Mosaic toolchain), then the measurements that
# gate this round's defaults. Each section has its own timeout so one stall
# can't eat the window; output is append-logged for PERF.md.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r4.log}
export MISTRALRS_CACHE_DIR=/tmp/mistralrs_xla_cache
sec() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name exit=$? ($(date -u +%H:%M:%S)) ---" >> "$LOG"
}

# 1. kernel correctness gate on real Mosaic (fused epilogues + natural q6k)
sec kernel_gate 1500 env MISTRALRS_TPU_TESTS=1 python -m pytest -m tpu -q -x \
    tests/test_tpu_paths.py -k "int8_path or q4k_kernel or affine" \
    --no-header
# 2. end-to-end step decomposition with the new kernels
sec step_decompose 1200 python scripts/step_decompose.py
# 3. scoreboard
sec bench 720 python bench.py
# 4. raw per-call kernel costs (act-quant chain, scan floor)
sec layer_decompose2 900 python scripts/layer_decompose2.py
# 5. single-stream config A/B (decode_steps x engine width)
sec ss_ab 1800 python scripts/ss_ab.py
# 6. layer-scan unroll A/B
sec unroll_ab 1500 python scripts/unroll_ab.py
# 7. long-context decode: 16k/32k, bf16 vs int8 KV, windowed, paged kernel
sec longctx_ab 1800 python scripts/longctx_ab.py
# 8. ragged backend retest with explicit kernel chunking (VERDICT #6)
sec ragged_ab 900 python scripts/ragged_ab.py
# 9. Q5_K int8 A/B (the one kernel gate still without perf data)
sec q5k_int8_ab 900 python scripts/dequant_ab3.py --q5k-int8
echo "=== queue4 done ($(date -u +%H:%M:%S)) ===" >> "$LOG"
# 10. scan-group fragmentation A/B (appended while queue ran — pure append)
sec group_ab 1500 python scripts/group_ab.py
echo "=== queue4 done+appendix ($(date -u +%H:%M:%S)) ===" >> "$LOG"
# 11. batch-32 step decomposition (the other headline's attack map)
sec step_decompose_b32 1500 python scripts/step_decompose.py --batch32
echo "=== queue4 fully done ($(date -u +%H:%M:%S)) ===" >> "$LOG"
