"""Re-measure the ef-autoscale sweep rows with workload calibration.

The first batch22 sweep calibrated on synthesized member-mix probes and
under-provisioned fully-random queries (0.9 target -> ef=20 -> served
0.45).  calibrate_ef(probe_queries=) fixes that; this runner measures
exactly the hnsw_autoef rows with the fix, without re-running the whole
sweep.

Usage: python benchmarks/exp/autoef.py [n]
Appends rows to benchmarks/results_tpu_r3.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

OUT = os.path.join(os.path.dirname(__file__), "..", "results_tpu_r3.jsonl")


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    d, k, n_q = 128, 10, 1024
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    from hnsw_tpu import Graph
    from hnsw_tpu.ops.topk import np_exact_topk

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((n_q, d)).astype(np.float32)
    _, gt = np_exact_topk(queries, data, k, "cosine")

    g = Graph(m=16, metric="cosine", seed=0)
    g.build(list(range(n)), data, wave=2048)
    g.fast_math = True

    def recall_of(ids):
        return float(np.mean([len(set(ids[r]) & set(gt[r])) / k
                              for r in range(len(ids))]))

    for tgt in (0.9, 0.95):
        t0 = time.perf_counter()
        ef_c, rec_c = g.calibrate_ef(tgt, k=k, seed=3,
                                     probe_queries=queries[:64])
        cal_s = time.perf_counter() - t0
        g.batch_search(queries, k)  # warm at installed ef
        t0 = time.perf_counter()
        for _ in range(3):
            _, i_out = g.batch_search_slots(queries, k)
        dt = (time.perf_counter() - t0) / 3
        emit({"config": f"cosine_{n // 1000}kx{d}",
              "strategy": "hnsw_autoef_workload", "target": tgt,
              "ef": ef_c, "probe_recall": round(rec_c, 4),
              "calibrate_seconds": round(cal_s, 2),
              "qps": round(n_q / dt, 0),
              "recall@10": round(recall_of(np.asarray(i_out)), 4),
              "platform": jax.devices()[0].platform})
        g._ef_calib.clear()
        g._ef_default = None


if __name__ == "__main__":
    main()
