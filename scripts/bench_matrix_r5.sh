#!/bin/bash
# Round-5 on-chip benchmark matrix, phase 1 (sd15 512px rows): re-measure the
# full inverter matrix post-bf16-param-storage (VERDICT r4 #7) plus the
# serving-mode batch-1 row (VERDICT r4 #1a).  Appends JSON rows (now carrying
# MFU fields + effective repeats/sync mode) to the output file.
#
# Compiles are cold on this host: each new program signature costs minutes
# through the compile relay — run unattended, never kill mid-compile.
#
# Usage: bash scripts/bench_matrix_r5.sh [out.jsonl]
set -o pipefail
out="${1:-result/bench_matrix_r5.jsonl}"
mkdir -p "$(dirname "$out")"
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
    echo "=== $* ===" >&2
    env "$@" python bench.py | tee -a "$out"
}

run BENCH_CONFIG=etainv_ptp BENCH_BATCH=1                      # latency mode
# serving latency: diffinv+simple is the only bitwise-exact serving combo
# (etainv/dirinv are source-anchored and rejected; hook editors degrade)
run BENCH_CONFIG=diffinv_simple BENCH_BATCH=1 BENCH_NO_SRC_BWD=1 BENCH_SYNC=1
run BENCH_CONFIG=diffinv_simple BENCH_BATCH=8
run BENCH_CONFIG=ddpminv_ptp BENCH_BATCH=8
run BENCH_CONFIG=regdiffinv_simple BENCH_BATCH=8
run BENCH_CONFIG=edict_simple BENCH_BATCH=8
run BENCH_CONFIG=dpm_simple BENCH_BATCH=8
# nti: the 550-UNet-call worst case (reference null_text_inversion.py:42-94);
# one steady batch is ~2 min of device time, so a single repeat suffices
run BENCH_CONFIG=nti_simple BENCH_BATCH=8 BENCH_REPEATS=1
echo "matrix phase 1 done -> $out" >&2
