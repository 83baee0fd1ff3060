#!/bin/bash
# TPU batch 17: final sweep re-run — picks up the off-node calibrator
# fix (target_recall contract) and the disk-row warm fix.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 5400 python benchmarks/sweep.py | tee /tmp/sweep_r2b.out
grep '^{' /tmp/sweep_r2b.out >> benchmarks/results_tpu_r2_sweep.jsonl
echo "BATCH17 DONE rc=$?"
