#!/bin/bash
# batch25 — round-3 late: 8M/16M clustered single-chip graph regime.
# ONE TPU process at a time (the relay is single-client); nohup, no
# timeouts (a killed TPU process poisons the next first-D2H for up to
# ~22 min). Sequence:
#   1. big_clustered 8M all        (f32 descent build + f32 serve ladder)
#   2. big_clustered 8M serve fp16 (fp16 capacity tier on the same cache)
#   3. big_clustered 16M all fp16  (fp16 descent build + fp16 serve)
set -e
cd "$(dirname "$0")/../.."
HNSW_TPU_BUILD_PROGRESS=1 python benchmarks/exp/big_clustered.py 8388608 8192 all
python benchmarks/exp/big_clustered.py 8388608 8192 serve fp16
HNSW_TPU_BUILD_PROGRESS=1 python benchmarks/exp/big_clustered.py 16777216 8192 all fp16
