"""Serving configs on real graphs: baseline vs block layout vs pivots.

Usage: block_hop.py [N] [wave]
Rows: op=hnsw_cfg with cfg in {base, block, block+piv, capacity}.
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
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    d, k = 128, 10
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu import Graph
    from hnsw_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data, wave=wave)
    print(f"# build {time.perf_counter() - t0:.0f}s", flush=True)
    g.fast_math = True

    B = 1024
    q = rng.standard_normal((B, d)).astype(np.float32)
    dev = g.device_graph()
    _, gt_i = exact_topk(jnp.asarray(q), dev.vectors, dev.sq_norms,
                         dev.alive, k=k, metric="cosine")
    gt = np.asarray(gt_i)

    def measure(cfg, ef):
        g.batch_search(q, k, ef=ef)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(3):
            keys, _ = g.batch_search(q, k, ef=ef)
        dt = (time.perf_counter() - t0) / 3
        hits = sum(len(set(keys[r]) & set(map(int, gt[r])))
                   for r in range(B))
        emit({"op": "hnsw_cfg", "n": n, "cfg": cfg, "ef": ef,
              "qps": round(B / dt), "recall": round(hits / (B * k), 4)})

    efs = (192, 384) if n <= 20000 else (192, 384, 768)
    for ef in efs:
        measure("base", ef)
    g.block_layout = True
    for ef in efs:
        measure("block", ef)
    g.entry_mode = "pivots"
    for ef in efs:
        measure("block+piv", ef)
    g.entry_mode = "descent"
    g.block_layout = False
    g.hbm_mode = "quantized"
    for ef in efs:
        measure("capacity", ef)


if __name__ == "__main__":
    main()
