#!/bin/bash
# Test runner (counterpart of /root/reference/test/test_all.sh): run each suite,
# teeing logs to result/test/.
mkdir -p result/test
for t in schedulers models inversion editing batched metrics data eval_harness weights native parallel demo; do
    python -m pytest "tests/test_${t}.py" -q 2>&1 | tee "result/test/${t}.log"
done
