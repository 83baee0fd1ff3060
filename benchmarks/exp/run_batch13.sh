#!/bin/bash
# TPU batch 13: 2M single-chip build, wave=8192 — the 16384-wave run
# OOM'd ~2 full waves in (intra [W,W] + descent buffers on top of the
# ~9 GB static set); halving the wave frees ~2.5 GB.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 10800 python benchmarks/exp/scale_build.py 2000000 8192 random quant graph
echo "BATCH13 DONE rc=$?"
