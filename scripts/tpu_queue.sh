#!/bin/bash
# Hardware work queue: run the moment the axon TPU tunnel recovers.
# Usage: bash scripts/tpu_queue.sh [out_dir]   (default /tmp/tpu_queue_out)
set -u
OUT=${1:-/tmp/tpu_queue_out}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 90 python -c "
import jax, numpy as np
x = jax.numpy.ones((8,8)); print('TPU OK', np.asarray(x@x)[0,0])
" || { echo "TUNNEL STILL DOWN"; exit 1; }

echo "== bench (driver metric) ==" | tee "$OUT/bench.log"
timeout 580 python -u bench.py 2>&1 | tee -a "$OUT/bench.log"

echo "== tpu-marked tests (incl. bf16 flash + ragged_dot gate) =="
MISTRALRS_TPU_TESTS=1 timeout 580 python -m pytest tests/test_tpu_paths.py -m tpu -q \
  2>&1 | tee "$OUT/tpu_tests.log"

echo "== bf16 flash prefill pp A/B =="
timeout 580 python -u scripts/flash_ab.py 2>&1 | tee "$OUT/flash_ab.log"

echo "== MoE backend A/B (ragged_dot vs megablocks gmm) =="
timeout 580 python -u scripts/moe_ab.py 2>&1 | tee "$OUT/moe_ab.log"

echo "== batch 32/64 serving sweep =="
timeout 580 python -u scripts/batch_sweep.py 2>&1 | tee "$OUT/batch_sweep.log"

echo "== dequant floor experiments (cast probe / LUT / int8-MXU) =="
timeout 580 python -u scripts/dequant_ab.py 2>&1 | tee "$OUT/dequant_ab.log"

echo "== splash windowed/softcapped prefill A/B =="
timeout 580 python -u scripts/splash_ab.py 2>&1 | tee "$OUT/splash_ab.log"

echo "== unified ragged-paged-attention decode A/B =="
timeout 580 python -u scripts/ragged_ab.py 2>&1 | tee "$OUT/ragged_ab.log"

echo "== dequant kernel block-size sweep (q4k/q5k/q6k/q8_0/q2k) =="
timeout 580 python -u scripts/kernel_sweep.py 2>&1 | tee "$OUT/kernel_sweep.log"

echo "== done; inspect $OUT =="
