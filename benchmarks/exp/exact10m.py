"""Exact serving at 10M x 128 on ONE chip — the capacity headline.

The reference has no bulk/large-N story at all (graph.go:437 inserts
serially; its benchmarks stop at 100k).  Here the exact MXU tier serves
>10M vectors from HBM directly: 10,485,760 x 128 f32 is 5.37 GB, well
inside one v5e's 16 GB, and the fast_math scan (bf16 MXU + approx_min_k
+ f32 rerank, ops/topk.py) keeps selection off the critical path.

Data is generated ON DEVICE (jax.random) — no 5 GB relay transfer.
N is chosen as 160 * 65536 so the chunked scan's reshape is copy-free
(a non-multiple N pads the whole table: +5.37 GB HBM at this scale).

Usage: python benchmarks/exp/exact10m.py [N] [B]
Appends rows to benchmarks/results_tpu_r3.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "results_tpu_r3.jsonl")


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 160 * 65536
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    d, k = 128, 10
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.ops.topk import exact_topk

    key = jax.random.PRNGKey(0)
    kv, kq = jax.random.split(key)
    t0 = time.perf_counter()
    v = jax.random.normal(kv, (n, d), jnp.float32)
    s = jnp.sum(v * v, axis=-1)
    alive = jnp.ones((n,), bool)
    q = jax.random.normal(kq, (B, d), jnp.float32)
    jax.block_until_ready(s)
    emit({"op": "exact10m", "n": n, "B": B, "stage": "gen_device",
          "seconds": round(time.perf_counter() - t0, 1)})

    def bench(tag, fast):
        f = lambda: exact_topk(q, v, s, alive, k=k, metric="cosine",
                               fast_math=fast)
        dd, ii = f()
        jax.block_until_ready(ii)
        t0 = time.perf_counter()
        for _ in range(3):
            dd, ii = f()
        jax.block_until_ready(ii)
        dt = (time.perf_counter() - t0) / 3
        emit({"op": "exact10m", "n": n, "B": B, "variant": tag,
              "qps": round(B / dt), "ms_batch": round(dt * 1e3, 1)})
        return np.asarray(ii)

    gt = bench("oracle_f32", False)
    ii = bench("fast", True)
    rec = np.mean([len(set(ii[r]) & set(gt[r])) / k for r in range(B)])
    emit({"op": "exact10m", "n": n, "B": B, "variant": "fast_recall",
          "recall": round(float(rec), 5)})


if __name__ == "__main__":
    main()
