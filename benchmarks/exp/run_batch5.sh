#!/bin/bash
# TPU batch 5: fixed block micro; fixed packed-key kernel at 1M; then
# the 1M device build + quality curve (VERDICT item 5).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 900 python benchmarks/exp/block_micro.py
timeout 1800 python benchmarks/exp/exact1m.py
timeout 3600 python benchmarks/exp/scale_build.py 1000000 16384 random quant
echo "BATCH5 DONE rc=$?"
