"""A/B the per-hop pool update: full lax.sort vs bitonic merge network.

Usage: merge_ab.py [N]
Builds an N x 128 graph (method=auto), serves with the block layout +
pivot entry at the bench operating points, and records qps/recall for
merge_strategy in {sort, bitonic}.
Appends rows to benchmarks/results_tpu_r2.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "results_tpu_r2.jsonl")


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    d, k, B = 128, 10, 1024
    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    from hnsw_tpu import Graph
    from hnsw_tpu.ops.topk import np_exact_topk

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data)
    print(f"# build {time.perf_counter() - t0:.1f}s", flush=True)
    g.fast_math = True
    g.block_layout = True
    g.entry_mode = "pivots"
    q = rng.standard_normal((B, d)).astype(np.float32)
    _, gt = np_exact_topk(q, data, k=k, metric="cosine")

    # Interleaved arms: relay throughput drifts minute-to-minute, so
    # measure (sort, bitonic) alternately per ef over ROUNDS rounds and
    # report the per-arm MEDIAN — back-to-back blocks confounded drift
    # with the real delta (ROADMAP item 9).
    efs = (192, 384) if n <= 30_000 else (192, 384, 768)
    ROUNDS = 5
    for ef in efs:
        times = {"sort": [], "bitonic": []}
        hits_by = {}
        for merge in ("sort", "bitonic"):   # warm both compiles first
            g.merge_strategy = merge
            keys, _ = g.batch_search(q, k, ef=ef)
            hits_by[merge] = sum(
                len(set(keys[r]) & set(map(int, gt[r])))
                for r in range(B))
        for _ in range(ROUNDS):
            for merge in ("sort", "bitonic"):
                g.merge_strategy = merge
                t0 = time.perf_counter()
                g.batch_search(q, k, ef=ef)
                times[merge].append(time.perf_counter() - t0)
        for merge in ("sort", "bitonic"):
            dt = float(np.median(times[merge]))
            emit({"op": "merge_ab", "n": n, "merge": merge, "ef": ef,
                  "qps": round(B / dt),
                  "recall": round(hits_by[merge] / (B * k), 4)})


if __name__ == "__main__":
    main()
