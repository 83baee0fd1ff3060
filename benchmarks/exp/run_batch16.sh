#!/bin/bash
# TPU batch 16: re-measure the 1M build with donated layer updates
# (r2 record: 1988s waves / ~33 min total at wave=16384).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 5400 python benchmarks/exp/scale_build.py 1000000 16384 random quant graph
echo "BATCH16 DONE rc=$?"
