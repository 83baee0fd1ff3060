"""fp16 capacity rung + stream_dtype on real TPU — quick validation.

Two rows at 1M x 128 clustered (the regime the rung exists for):
  1. ExactIndex hbm_dtype ladder: resolved rung, qps, recall vs the
     f32 oracle (auto should stop at a 2-byte rung instead of paying
     f32 capacity).
  2. StreamingExactIndex cold-path timing: f32 vs bf16 chunks over the
     relay (the link-bound tier stream_dtype exists for).

Appends JSON rows to benchmarks/results_tpu_r3.jsonl. Designed to be
CHEAP (~10 min incl. warmup): data generated on device, N=1M.
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
    n, d, k, B = 1 << 20, 128, 10, 4096
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp

    # clustered data ON DEVICE (tight enough to defeat int8; the jitter
    # ladder matches tests/test_exact.py physics at scale)
    key = jax.random.PRNGKey(0)
    kc, kb, kq = jax.random.split(key, 3)
    n_c = 1024
    centers = jax.random.normal(kc, (n_c, d), jnp.float32) * 5

    def draw(kk, m):
        ka, kn = jax.random.split(kk)
        asg = jax.random.randint(ka, (m,), 0, n_c)
        return centers[asg] + 0.3 * jax.random.normal(kn, (m, d),
                                                      jnp.float32)

    data = np.asarray(draw(kb, n))
    queries = np.asarray(draw(kq, B))

    from hnsw_tpu.index.exact import ExactIndex
    from hnsw_tpu.ops.topk import np_exact_topk

    print("# host oracle...", flush=True)
    _, gt = np_exact_topk(queries[:512], data, k, "cosine")

    def rec_of(keys):
        return round(np.mean([len(set(keys[r]) & set(map(int, gt[r])))
                              / k for r in range(512)]), 4)

    for mode in ("auto", "bf16", "fp16"):
        idx = ExactIndex(metric="cosine", hbm_dtype=mode)
        idx.batch_add(list(range(n)), data)
        idx.host_serve_max_batch = 0
        keys, _ = idx.batch_search(queries, k)          # warm + resolve
        t0 = time.perf_counter()
        for _ in range(3):
            keys, _ = idx.batch_search(queries, k)
        dt = (time.perf_counter() - t0) / 3
        emit({"op": "exact_capacity_rung", "n": n, "kind": "clustered",
              "mode": mode, "resolved": idx._resolved_hbm,
              "qps": round(B / dt), "recall": rec_of(keys)})
        del idx

    # streaming cold path: time ONE full pass at f32 vs bf16 chunks
    # (cache off => every chunk rides the link both runs)
    import tempfile
    from hnsw_tpu.index.streaming import StreamingExactIndex
    sub = 1 << 18                                        # 256k: ~128 MB f32
    for dt_name in ("float32", "bf16"):
        tmp = tempfile.mkdtemp()
        sx = StreamingExactIndex(tmp, metric="cosine", chunk_rows=65536,
                                 stream_dtype=dt_name)
        sx.batch_add(list(range(sub)), data[:sub])
        t0 = time.perf_counter()
        keys, _ = sx.batch_search(queries[:512], k)
        dt = time.perf_counter() - t0
        emit({"op": "stream_cold_pass", "n": sub, "kind": "clustered",
              "stream_dtype": dt_name, "seconds": round(dt, 2),
              "qps": round(512 / dt)})
        sx.close()


if __name__ == "__main__":
    main()
