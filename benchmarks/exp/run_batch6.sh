#!/bin/bash
# TPU batch 6: 1M IVF rows (random, device-resident k-means), then the
# full clustered 1M story: device build + graph ladder + exact + IVF.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 2400 python benchmarks/exp/scale_build.py 1000000 16384 random quant ivf
timeout 5400 python benchmarks/exp/scale_build.py 1000000 16384 clustered quant all
echo "BATCH6 DONE rc=$?"
