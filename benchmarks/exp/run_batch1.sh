#!/bin/bash
# TPU batch 1: 10k graph-tier evidence row + 1M exact-tier measurements.
# Sequential — the TPU relay is single-client.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 1200 python benchmarks/exp/scale_build.py 10000 2048 random
timeout 1800 python benchmarks/exp/exact1m.py
echo "BATCH1 DONE rc=$?"
