"""Fast exact serving at N x 128 (generalizes exp/fast2m.py).

The serving answer for random data at multi-million scale — the graph
tier needs ef >> 1536 on unstructured data (CLAUDE.md measured facts).
Measures exact_topk f32 oracle vs fast_math (bf16 + approx_min_k + f32
rerank, k+4 margin, 64k chunks) at B=8192, k=10.

Usage: python benchmarks/exp/fastN.py [N] [B]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    d, k = 128, 10
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.sum(data.astype(np.float64) * data, axis=1).astype(np.float32)
    v = jnp.asarray(data)
    s = jnp.asarray(sq)
    alive = jnp.ones((n,), bool)
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

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
        emit({"op": "fastN", "n": n, "B": B, "variant": tag,
              "qps": round(B / dt), "ms_batch": round(dt * 1e3, 1)})
        return np.asarray(ii)

    gt = bench("oracle_f32", False)
    ii = bench("fast", True)
    rec = np.mean([len(set(ii[r]) & set(gt[r])) / k for r in range(B)])
    emit({"op": "fastN", "n": n, "B": B, "variant": "fast_recall",
          "recall": round(float(rec), 5)})


if __name__ == "__main__":
    main()
