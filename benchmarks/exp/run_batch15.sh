#!/bin/bash
# TPU batch 15: full BASELINE-config sweep on the real chip (graph /
# exact / IVF ladders, metrics, deletes, adaptive, target-recall,
# facets/negatives, disk-tier op timings, 10k x 512, surface overhead).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 5400 python benchmarks/sweep.py | tee /tmp/sweep_r2.out
grep '^{' /tmp/sweep_r2.out >> benchmarks/results_tpu_r2_sweep.jsonl
echo "BATCH15 DONE rc=$?"
timeout 1800 python benchmarks/exp/fast2m.py
echo "BATCH15+fast2m DONE rc=$?"
