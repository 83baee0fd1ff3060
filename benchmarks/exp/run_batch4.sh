#!/bin/bash
# TPU batch 4: block-gather micro; serving configs at 10k + 100k;
# fixed packed-key kernel at 1M; block-descent build timing at 100k.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 900 python benchmarks/exp/block_micro.py
timeout 1200 python benchmarks/exp/block_hop.py 10000
timeout 1800 python benchmarks/exp/exact1m.py
timeout 2400 python benchmarks/exp/block_hop.py 100000 8192
timeout 2400 python benchmarks/exp/scale_build.py 100000 8192 random quant
echo "BATCH4 DONE rc=$?"
