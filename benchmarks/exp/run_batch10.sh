#!/bin/bash
# TPU batch 10: exact-tier final-stage ablation (ROADMAP 3), post-bitonic
# hop dissection (ROADMAP 1), interleaved merge A/B re-run (ROADMAP 9).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 3600 python benchmarks/exp/rerank1m.py
timeout 2400 python benchmarks/exp/hop_micro4.py
timeout 3600 python benchmarks/exp/merge_ab.py 100000
echo "BATCH10 DONE rc=$?"
# re-measure 1M clustered blockpiv after the fp16-block fix (graph
# loads from the codec cache; only serving configs run)
timeout 7200 python benchmarks/exp/serve1m.py clustered 1000000
echo "BATCH10+serve1m DONE rc=$?"
