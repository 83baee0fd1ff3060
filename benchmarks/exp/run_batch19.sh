#!/bin/bash
# TPU batch 19: sweep with the review fixes (resident-array oracle for
# target_recall validation, calibration margin, exact filtered path).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 5400 python benchmarks/sweep.py | tee /tmp/sweep_r2d.out
grep '^{' /tmp/sweep_r2d.out >> benchmarks/results_tpu_r2_sweep.jsonl
echo "BATCH19 DONE rc=$?"
