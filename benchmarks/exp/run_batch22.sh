#!/bin/bash
# TPU batch 22 (round 3): serving re-measurement after the local-repair
# + reopen work, plus the 4M fast-exact tier.
#   1. full sweep (new rows: ivf auto-nprobe, adaptive reference table,
#      ef=20 native latency, local delete refine cost)
#   2. fast exact at 4M (oracle vs fast_math)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
python benchmarks/sweep.py | tee benchmarks/results_tpu_r3_sweep2.jsonl
python benchmarks/exp/fastN.py 4000000 8192
python benchmarks/exp/exact10m.py
echo "BATCH22 DONE rc=$?"
