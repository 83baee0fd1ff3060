"""Headline benchmark — run on one real TPU chip by the round driver.

Config: BASELINE.json #1 — cosine HNSW build+search on 10k x 128-d
random float32, M=16, recall@10. Reference anchor: the Go library's
adaptive hybrid serves this at 2.51 ms/query ≈ 398 QPS at recall 0.98
(hnsw-extensions/hybrid/README.md:650; BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": x}
where QPS is batched HNSW search throughput at recall@10 >= 0.95.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hnsw_tpu import Graph
    from hnsw_tpu.ops.topk import exact_topk
    from hnsw_tpu.utils.warmup import warmup_transfers

    warmup_transfers()

    n, d, k = 10_000, 128, 10
    n_q = 1024
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((n_q, d)).astype(np.float32)

    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data)
    build_s = time.perf_counter() - t0

    dev = g.device_graph()
    gt_d, gt_i = exact_topk(jnp.asarray(queries), dev.vectors, dev.sq_norms,
                            dev.alive, k=k, metric="cosine")
    gt = np.asarray(gt_i)

    best = None
    results = []
    for ef in (32, 48, 64, 96, 128):
        # compile + warm
        keys, _ = g.batch_search(queries, k, ef=ef)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            d_out, i_out = g.batch_search_slots(queries, k, ef=ef)
        dt = (time.perf_counter() - t0) / reps
        qps = n_q / dt
        hits = 0
        for qi in range(n_q):
            hits += len(set(map(int, i_out[qi])) & set(map(int, gt[qi])))
        recall = hits / (n_q * k)
        results.append((ef, qps, recall))
        print(f"# ef={ef}: qps={qps:.0f} recall@10={recall:.4f}",
              file=sys.stderr)
        if recall >= 0.95 and (best is None or qps > best[1]):
            best = (ef, qps, recall)

    if best is None:  # fall back to highest-recall point
        best = max(results, key=lambda r: r[2])
    ef, qps, recall = best
    baseline_qps = 398.4
    print(json.dumps({
        "metric": "hnsw_search_qps_10kx128_recall@10>=0.95",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / baseline_qps, 2),
        "recall": round(recall, 4),
        "ef": ef,
        "build_seconds": round(build_s, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
