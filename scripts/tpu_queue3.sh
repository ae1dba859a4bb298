#!/bin/bash
# Round-3 third hardware queue: new int8-MXU kernel A/Bs + on-chip parity
# for Q8_0/Q5_K, post Q4_K/Q6_K default flips. Usage: bash scripts/tpu_queue3.sh [out]
set -u
OUT=${1:-/tmp/tpu_queue3_out}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 300 python -c "
import jax, numpy as np
x = jax.numpy.ones((8,8)); print('TPU OK', np.asarray(x@x)[0,0])
" || { echo "TUNNEL DOWN"; exit 1; }

echo "== on-chip parity: q8_0/q5k int8 paths =="
MISTRALRS_TPU_TESTS=1 timeout 580 python -m pytest tests/test_tpu_paths.py -m tpu -q \
  -k "q8_0_int8 or q5k_int8" 2>&1 | tee "$OUT/int8_tests.log"

echo "== q8_0 int8 A/B =="
timeout 420 python -u scripts/dequant_ab3.py --q8_0-int8 2>&1 | tee "$OUT/q8_0_ab.log"

echo "== q5k int8 A/B =="
timeout 420 python -u scripts/dequant_ab3.py --q5k-int8 2>&1 | tee "$OUT/q5k_ab.log"

echo "== done; inspect $OUT =="
