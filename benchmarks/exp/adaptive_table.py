"""Re-measure the reference's flagship adaptive table (config 4c of
benchmarks/sweep.py) standalone — after the adaptive quality-floor fix
(arms below AdaptiveConfig.recall_target lose arbitration; probe misses
self-tune the graph ef). Row-for-row vs hybrid/README.md:649-652:

  1k x 128 random     0.052 ms avg, recall 1.00
  10k x 128 random    2.51 ms avg,  recall 0.98
  10k x 512 random    1.97 ms avg,  recall 0.96
  10k x 128 clustered 2.01 ms avg,  recall 0.97

Target: beat every reference row on BOTH axes (avg ms AND recall) —
before the fix the repo won latency 8x but served 0.34/0.04 recall on
the random rows (the latency weight elected the default-ef graph arm).

Usage: python benchmarks/exp/adaptive_table.py   (real TPU; ~10 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from hnsw_tpu.utils.warmup import warmup_transfers  # noqa: E402

warmup_transfers()

from benchmarks.datasets import synthetic_standin  # noqa: E402
from benchmarks.sweep import recall_of  # noqa: E402
from hnsw_tpu import AdaptiveHybridIndex, HybridConfig  # noqa: E402
from hnsw_tpu.ops.topk import np_exact_topk  # noqa: E402


def main():
    k = 10
    ref_rows = [(1000, 128, "random", 0.052, 1.00),
                (10_000, 128, "random", 2.51, 0.98),
                (10_000, 512, "random", 1.97, 0.96),
                (10_000, 128, "clustered", 2.01, 0.97)]
    for rn, rd, kind, ref_ms, ref_rec in ref_rows:
        base_v, qv = synthetic_standin(rn, rd, 256, seed=11, kind=kind)
        at = AdaptiveHybridIndex(
            hybrid_config=HybridConfig(exact_threshold=500))
        at.batch_add(list(range(rn)), base_v)
        # warm + let the probe/bandit converge (the reference's own
        # table is steady-state too)
        for i in range(64):
            at.search(qv[i % len(qv)], k)
        lat = []
        for i in range(200):
            t0 = time.perf_counter()
            at.search(qv[i % len(qv)], k)
            lat.append(time.perf_counter() - t0)
        lat.sort()
        keys_a = [[kk for kk, _ in at.search(qv[i], k)]
                  for i in range(64)]
        _, gta = np_exact_topk(qv[:64], base_v, k, "cosine")
        print(json.dumps({
            "config": "adaptive_reference_table",
            "rows": f"{rn}x{rd}_{kind}",
            "avg_ms": round(sum(lat) / len(lat) * 1000, 3),
            "p95_ms": round(lat[int(0.95 * len(lat))] * 1000, 3),
            "recall@10": round(recall_of(keys_a, gta, k), 4),
            "reference_avg_ms": ref_ms,
            "reference_recall": ref_rec,
            "platform": "tpu"}), flush=True)


if __name__ == "__main__":
    main()
