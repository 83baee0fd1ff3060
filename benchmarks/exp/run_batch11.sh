#!/bin/bash
# TPU batch 11: 2M-vector single-chip device build (ROADMAP item 4).
# The block_m HBM guard auto-narrows construction blocks to 16; donated
# layer updates remove the ~3 GB per-update transient that capped r2
# builds at 1M.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export HNSW_TPU_BUILD_PROGRESS=1
# validate the approx_min_k recall_target fix (fast exact should be
# back to ~130k qps @ recall >= .999 at 1M)
timeout 1800 python benchmarks/exp/select1m.py
timeout 1200 python benchmarks/exp/hop_micro5.py
# re-run the final-stage ablation at the fixed 0.95 target
timeout 3600 python benchmarks/exp/rerank1m.py
# validate the full-density fit check: clustered blockpiv should now
# auto-select fp16 blocks and recover ~base recall at higher qps
timeout 3600 python benchmarks/exp/serve1m.py clustered 1000000
timeout 10800 python benchmarks/exp/scale_build.py 2000000 16384 random quant graph
echo "BATCH11 DONE rc=$?"
