#!/bin/bash
# TPU batch 2: int8 traversal + batch scaling on the graph; packed-key
# fused exact kernel at 1M. Sequential — the TPU relay is single-client.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 1800 python benchmarks/exp/quant_hop.py 10000
timeout 1800 python benchmarks/exp/exact1m.py
echo "BATCH2 DONE rc=$?"
