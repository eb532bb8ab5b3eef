#!/bin/bash
# Round-5 on-chip benchmark matrix, phase 2: the flagship batch-8 row (also
# re-warms the persistent compile cache for the driver's round-end bench) and
# the model-family rows (VERDICT r4 #3).  Rows now carry MFU fields.
#
# Usage: bash scripts/bench_matrix_r5_phase2.sh [out.jsonl]
set -o pipefail
out="${1:-result/bench_matrix_r5.jsonl}"
mkdir -p "$(dirname "$out")"
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
    echo "=== $* ===" >&2
    env "$@" python bench.py | tee -a "$out"
}

run BENCH_CONFIG=etainv_ptp BENCH_BATCH=8                      # flagship
run BENCH_CONFIG=etainv_ptp BENCH_BATCH=8 BENCH_MODEL=sd21     # SD2.x 512px
run BENCH_CONFIG=etainv_ptp BENCH_BATCH=8 BENCH_MODEL=sd21v    # 768px v-pred
run BENCH_CONFIG=etainv_ptp BENCH_BATCH=4 BENCH_MODEL=sdxl     # 1024px
echo "matrix phase 2 done -> $out" >&2
