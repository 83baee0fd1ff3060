#!/bin/bash
# TPU batch 12: validate the shipped fast-exact combo (margin k+4 +
# 65536 chunks — rerank1m measured the pieces at 171.9k/167.5k qps),
# re-validate the headline bench, and serve the 2M graph from batch11's
# codec cache.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 1800 python benchmarks/exp/select1m.py
timeout 1800 python bench.py
timeout 7200 python benchmarks/exp/serve1m.py random 2000000
echo "BATCH12 DONE rc=$?"
