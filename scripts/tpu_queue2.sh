#!/bin/bash
# Round-3 follow-up hardware queue: re-runs of the harnesses that failed in
# the first window (q4k prefill VMEM OOM -> fixed by the n_rows guard;
# moe_ab jit-constant capture -> fixed by arg-passing) plus the new
# decomposition/window harnesses. Usage: bash scripts/tpu_queue2.sh [out]
set -u
OUT=${1:-/tmp/tpu_queue2_out}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 300 python -c "
import jax, numpy as np
x = jax.numpy.ones((8,8)); print('TPU OK', np.asarray(x@x)[0,0])
" || { echo "TUNNEL DOWN"; exit 1; }

echo "== dequant decomposition + XLA int4 probes (dequant_ab2) =="
timeout 580 python -u scripts/dequant_ab2.py 2>&1 | tee "$OUT/dequant_ab2.log"

echo "== LUT + int8-MXU (dequant_ab B/C; cast probes hung the compiler) =="
timeout 420 python -u -c "
import sys; sys.path.insert(0, 'scripts')
import dequant_ab
print('== B. LUT vs arithmetic unpack ==', flush=True)
dequant_ab._lut_vs_chain()
print('== C. int8-MXU GEMV prototype ==', flush=True)
dequant_ab._int8_proto()
" 2>&1 | tee "$OUT/dequant_bc.log"

echo "== batch 32/64 serving sweep (post-guard) =="
timeout 580 python -u scripts/batch_sweep.py 2>&1 | tee "$OUT/batch_sweep.log"

echo "== MoE backend A/B (arg-passing fix) =="
timeout 580 python -u scripts/moe_ab.py 2>&1 | tee "$OUT/moe_ab.log"

echo "== bf16 flash prefill pp A/B (post-guard) =="
timeout 580 python -u scripts/flash_ab.py 2>&1 | tee "$OUT/flash_ab.log"

echo "== unified ragged decode A/B (device-side pools + arg-passing fix) =="
timeout 580 python -u scripts/ragged_ab.py 2>&1 | tee "$OUT/ragged_ab.log"

echo "== windowed decode gather @16k =="
timeout 580 python -u scripts/window_ab.py 2>&1 | tee "$OUT/window_ab.log"

echo "== new on-chip kernel-family tests (q5k + affine) =="
MISTRALRS_TPU_TESTS=1 timeout 580 python -m pytest tests/test_tpu_paths.py -m tpu -q \
  -k "q5k or q2k or gptq or hqq" 2>&1 | tee "$OUT/tpu_tests2.log"

echo "== kernel block-size sweep (q5k/q2k now alignment-eligible) =="
timeout 580 python -u scripts/kernel_sweep.py 2>&1 | tee "$OUT/kernel_sweep.log"

echo "== done; inspect $OUT =="
