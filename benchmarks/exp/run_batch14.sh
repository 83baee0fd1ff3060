#!/bin/bash
# TPU batch 14: 2M serving A/B from batch13's codec cache.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
timeout 7200 python benchmarks/exp/serve1m.py random 2000000
echo "BATCH14 DONE rc=$?"
