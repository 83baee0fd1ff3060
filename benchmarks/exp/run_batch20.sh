#!/bin/bash
# TPU batch 20 (round 3): revalidate the headline + measure the new
# latency tier, then the full sweep. Run with nohup, never kill
# mid-flight (relay D2H poisoning — CLAUDE.md).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
python bench.py 2> >(sed 's/^/# /' >&2)
python benchmarks/exp/native_crossover.py 10000
python benchmarks/sweep.py | tee -a benchmarks/results_tpu_r3_sweep.jsonl
echo "BATCH20 DONE rc=$?"
