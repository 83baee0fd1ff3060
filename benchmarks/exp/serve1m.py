"""1M-scale graph SERVING config A/B: base vs block+pivots, sort vs
bitonic merge.

The scale_build ladder measures the base config; this isolates the
serving levers at 1M. Builds once and caches the graph via the codec
(/tmp/g1m_<kind>.npz) so repeat runs skip the ~35 min build.

Usage: serve1m.py [random|clustered] [N]
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
    kind = sys.argv[1] if len(sys.argv) > 1 else "random"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    d, k, B = 128, 10, 1024
    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu import Graph
    from hnsw_tpu.io.codec import load_graph, save_graph
    from hnsw_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(0)
    if kind == "clustered":
        from benchmarks.datasets import synthetic_standin
        data, _ = synthetic_standin(n, d, 1, seed=0, kind="clustered")
    else:
        data = rng.standard_normal((n, d)).astype(np.float32)

    cache = f"/tmp/g1m_{kind}_{n}.npz"
    if os.path.exists(cache):
        g = load_graph(cache)
        print(f"# loaded cached graph {cache}", flush=True)
    else:
        g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
        t0 = time.perf_counter()
        g.build(list(range(n)), data, wave=16384, method="device",
                quant_descent=True)
        emit({"op": "serve1m_build", "n": n, "kind": kind,
              "seconds": round(time.perf_counter() - t0, 1)})
        save_graph(g, cache)
    g.fast_math = True

    q = rng.standard_normal((B, d)).astype(np.float32)
    vd = jnp.asarray(data)
    sq = jnp.sum(vd * vd, axis=1)
    alive = jnp.ones((n,), bool)
    qd = jnp.asarray(q)
    _, gt = exact_topk(qd, vd, sq, alive, k=k, metric="cosine")
    gt = np.asarray(gt)
    t0 = time.perf_counter()
    for _ in range(3):
        _, ii = exact_topk(qd, vd, sq, alive, k=k, metric="cosine")
    jax.block_until_ready(ii)
    emit({"op": "exact", "n": n, "kind": kind, "recall": 1.0,
          "qps": round(3 * B / (time.perf_counter() - t0))})
    del vd, sq, alive

    efs = (192, 384, 768) if kind == "random" else (96, 192, 384)
    if n >= 2_000_000:
        # full blocks at 2M are 8.6 GB on top of vectors+tables (~13 GB
        # total) — serve the HBM-feasible narrow-block config instead
        g.block_m = 16
    for cfg in ("base", "blockpiv"):
        g.block_layout = cfg == "blockpiv"
        g.entry_mode = "pivots" if cfg == "blockpiv" else "descent"
        for merge in ("sort", "bitonic"):
            g.merge_strategy = merge
            for ef in efs:
                f = lambda: g.batch_search(q, k, ef=ef)
                keys, _ = f()
                t0 = time.perf_counter()
                for _ in range(3):
                    keys, _ = f()
                dt = (time.perf_counter() - t0) / 3
                hits = sum(len(set(keys[r]) & set(map(int, gt[r])))
                           for r in range(B))
                emit({"op": "serve1m", "n": n, "kind": kind, "cfg": cfg,
                      "merge": merge, "ef": ef, "qps": round(B / dt),
                      "recall": round(hits / (B * k), 4)})


if __name__ == "__main__":
    main()
