"""int8 traversal store + query-batch scaling on the real graph.

Hypotheses (ROADMAP perf 1/3, VERDICT weak-1 lever):
  * the hop is gather-bound -> int8 rows (4x fewer bytes) speed it up;
  * the hop is latency-bound at B=1024 -> larger batches amortize it.
Usage: quant_hop.py [N]
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
    d, k = 128, 10
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu import Graph
    from hnsw_tpu.core.search import search_graph
    from hnsw_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data)
    print(f"# build {time.perf_counter() - t0:.0f}s", flush=True)

    B_max = 8192
    q_all = jnp.asarray(rng.standard_normal((B_max, d)).astype(np.float32))
    dev0 = g.device_graph()
    gt_d, gt_i = exact_topk(q_all, dev0.vectors, dev0.sq_norms, dev0.alive,
                            k=k, metric="cosine")
    gt = np.asarray(gt_i)

    for quant in (False, True):
        g.quant_traversal = quant
        g.fast_math = True
        dev = g.device_graph()
        for B in (1024, 8192):
            q = q_all[:B]
            for ef, E in ((192, 2), (384, 2)):
                H = max(128, 2 * ef // E)

                def f():
                    dd, ii = search_graph(dev, q, k=k, ef=ef,
                                          metric="cosine", max_hops=H,
                                          fast_math=True, expand=E)
                    ii.block_until_ready()
                    return ii

                ii = f()
                t0 = time.perf_counter()
                for _ in range(3):
                    ii = f()
                dt = (time.perf_counter() - t0) / 3
                ii = np.asarray(ii)
                hits = sum(len(set(map(int, ii[r])) & set(map(int, gt[r])))
                           for r in range(B))
                emit({"op": "hnsw_quant_exp", "n": n, "quant": quant,
                      "batch": B, "ef": ef, "expand": E,
                      "qps": round(B / dt),
                      "recall": round(hits / (B * k), 4)})


if __name__ == "__main__":
    main()
