#!/bin/bash
# TPU batch 9: re-validate bench.py (recall_target=0.99 fast exact),
# then a wave=32768 1M build-time experiment (graph ladder only).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 1800 python bench.py
timeout 5400 python benchmarks/exp/scale_build.py 1000000 32768 random quant graph
echo "BATCH9 DONE rc=$?"
