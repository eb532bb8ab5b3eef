#!/bin/bash
# Run the on-chip benchmark matrix sequentially and append JSON lines to
# result/bench_matrix.jsonl.  Order: flagship first (re-warms the persistent
# compile cache for the driver's round-end bench), then latency mode, the
# batch-16 scaling retest, and the second model family.
#
# Usage: bash scripts/bench_matrix.sh [out.jsonl]
set -o pipefail
out="${1:-result/bench_matrix.jsonl}"
mkdir -p "$(dirname "$out")"
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
    echo "=== $* ===" >&2
    env "$@" python bench.py | tee -a "$out"
}

run BENCH_CONFIG=etainv_ptp BENCH_BATCH=8                      # flagship
run BENCH_CONFIG=etainv_ptp BENCH_BATCH=1                      # latency mode
run BENCH_CONFIG=etainv_ptp BENCH_BATCH=16                     # scaling retest
run BENCH_CONFIG=etainv_ptp BENCH_BATCH=8 BENCH_MODEL=sd21     # second family
echo "matrix done -> $out" >&2
