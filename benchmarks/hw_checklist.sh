#!/bin/bash
# Everything to (re)capture on the real chip, in priority order, each under
# its own timeout (shell cap is 600 s; chained-jit compiles dominate).
# Run from the repo root. Results append to benchmarks/hw_results.txt.
#
#   bash benchmarks/hw_checklist.sh [step]
#
# Steps in "all": headline, grad, roofline, table1, table2, ceiling.
#   headline   bench.py JSON line (the driver metric)
#   grad       fwd/bwd split + scan-vs-gather backward A/B (2 processes)
#   roofline   HBM + VPU roof percentages (record in README/PARITY)
#   table1     benchmarks/run.py --sections binary,multilabel,sdf
#   table2     benchmarks/run.py --sections soft,each,vg
#   ceiling    masked-VMEM-ceiling test on device (VERDICT r3 item 8)
# Explicit-only (long): pass the step name to run them.
#   sweeps     grad band-cap knob sweep (1 process/variant)
#   tests      TPU-side pytest shards
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/hw_results.txt
step="${1:-all}"
log() { echo "=== $(date +%F' '%T) $*" | tee -a "$OUT"; }

run() { log "$*"; timeout 590 "$@" 2>&1 | tee -a "$OUT"; }

if [[ "$step" == all || "$step" == headline ]]; then
  # no backend wait here: the checklist is run interactively once the
  # backend is known up, and the wait would blow the 590 s step budget
  # (the long wait is for the unattended driver capture)
  log "bench.py headline"
  EDT_BENCH_BACKEND_WAIT_S=0 timeout 590 python bench.py 2>&1 | tee -a "$OUT"
fi
if [[ "$step" == all || "$step" == grad ]]; then
  log "grad split, scan backward (default)"
  EDT_TPU_BINARY_GRAD_SCAN=1 timeout 590 python benchmarks/breakdown.py \
    --section grad 2>&1 | tee -a "$OUT"
  log "grad split, gather backward (A/B)"
  EDT_TPU_BINARY_GRAD_SCAN=0 timeout 590 python benchmarks/breakdown.py \
    --section grad 2>&1 | tee -a "$OUT"
fi
if [[ "$step" == all || "$step" == roofline ]]; then
  run python benchmarks/breakdown.py --section roofline
fi
if [[ "$step" == all || "$step" == table1 ]]; then
  run python benchmarks/run.py --sections binary,multilabel,sdf
fi
if [[ "$step" == all || "$step" == table2 ]]; then
  run python benchmarks/run.py --sections soft,each,vg
fi
if [[ "$step" == all || "$step" == ceiling ]]; then
  EDT_TPU_TEST_PLATFORM=tpu timeout 590 python -m pytest \
    "tests/test_api.py::test_pallas_masked_ceiling_row_on_device" -q \
    2>&1 | tee -a "$OUT"
fi
if [[ "$step" == sweeps ]]; then
  # one process per variant (MLIR closed_call cache KeyError otherwise)
  for cap in 8 16 32 64 128; do
    log "grad sweep band_cap=$cap"
    EDT_TPU_GRAD_BAND_CAP=$cap timeout 590 python benchmarks/breakdown.py \
      --section grad 2>&1 | tail -6 | tee -a "$OUT"
  done
fi
if [[ "$step" == tests ]]; then
  for f in tests/test_golden_1d.py tests/test_golden_2d3d.py \
           tests/test_pallas_kernels.py tests/test_api.py \
           tests/test_grad.py tests/test_soft_multilabel.py \
           tests/test_binary_fast_path.py tests/test_scipy_differential.py; do
    log "tpu pytest $f"
    EDT_TPU_TEST_PLATFORM=tpu timeout 590 python -m pytest "$f" -q \
      2>&1 | tail -3 | tee -a "$OUT"
  done
fi
log "done ($step)"
