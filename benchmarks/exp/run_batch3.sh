#!/bin/bash
# TPU batch 3: hop dissection at the serving point; fixed packed-key
# kernel at 1M; 100k quant-descent build timing (sizes the 1M build).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 1200 python benchmarks/exp/hop_micro3.py
timeout 1800 python benchmarks/exp/exact1m.py
timeout 2400 python benchmarks/exp/scale_build.py 100000 8192 random quant
echo "BATCH3 DONE rc=$?"
