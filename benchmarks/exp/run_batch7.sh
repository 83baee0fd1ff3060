#!/bin/bash
# TPU batch 7: exact-tier selection ablation at 1M (approx_min_k fast
# path), then per-hop merge A/B at 10k and 100k serving configs.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 2400 python benchmarks/exp/select1m.py
timeout 1200 python benchmarks/exp/merge_ab.py 10000
timeout 2400 python benchmarks/exp/merge_ab.py 100000
echo "BATCH7 DONE rc=$?"
