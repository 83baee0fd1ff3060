#!/bin/bash
# TPU batch 21 (round 3): 4M single-chip build (ROADMAP 2 / VERDICT
# item 6). Split device neighbor storage (layer0 [cap,32] + uppers
# [L-1,cap,16]) + quant descent with the narrowed-block HBM guard.
# Estimated HBM: 2 GB f32 vectors + 0.5 GB int8 + ~3.3 GB split
# neighbors + 2 GB blocks (block_m=8) + wave buffers.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
python benchmarks/exp/scale_build.py 4000000 8192 random quant graph
echo "BATCH21 DONE rc=$?"
