#!/bin/bash
# TPU batch 8: clustered 1M serving A/B (build cached to /tmp), IVF 1M
# clustered re-measure with the HIGHEST-precision scan fix, then the
# random 1M serving A/B.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
timeout 1800 python benchmarks/exp/select1m.py
timeout 1800 python bench.py
timeout 7200 python benchmarks/exp/serve1m.py clustered 1000000
timeout 3600 python benchmarks/exp/scale_build.py 1000000 16384 clustered quant ivf
timeout 7200 python benchmarks/exp/serve1m.py random 1000000
echo "BATCH8 DONE rc=$?"
