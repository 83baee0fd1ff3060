#!/bin/sh
# Round-3 post-16M-build TPU queue. Run ONLY after the 16M build process
# has exited (axon relay is single-client). Stages run sequentially in
# one shell; each logs to /tmp and appends rows to results_tpu_r3.jsonl.
#
#   nohup sh benchmarks/exp/r3_post_build_queue.sh > /tmp/r3_queue.log 2>&1 &
#
# Stage 1: IVF ladder at 8M clustered (the partition tier's home regime;
#          queued since batch23 behind the 16M build).
# Stage 2: 16M fp16 serve-only rerun extending the graph ladder to
#          ef=1536 (the .99-recall rung the in-build serve pass lacks).
# Stage 3: bench.py validation so the driver's round-end run is known-good.
set -x
cd /root/repo

python benchmarks/exp/big_ivf.py 8388608 2048 \
    > /tmp/ivf8m.log 2>&1
echo "=== stage 1 (ivf 8M) rc=$?"

HNSW_TPU_EF_LADDER=1536 python benchmarks/exp/big_clustered.py \
    16777216 8192 serve fp16 > /tmp/serve16_ef1536.log 2>&1
echo "=== stage 2 (16M ef1536 serve) rc=$?"

python bench.py > /tmp/bench_r3_final.log 2>&1
echo "=== stage 3 (bench.py) rc=$?"
echo "=== queue done"
