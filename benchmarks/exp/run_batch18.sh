#!/bin/bash
# TPU batch 18: final sweep — target_recall now validates its route on
# a sample of each real batch (contract enforced on any workload).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 5400 python benchmarks/sweep.py | tee /tmp/sweep_r2c.out
grep '^{' /tmp/sweep_r2c.out >> benchmarks/results_tpu_r2_sweep.jsonl
echo "BATCH18 DONE rc=$?"
