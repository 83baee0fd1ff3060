"""End-to-end capacity-mode serving through ExactIndex, incl. rerank.

The exactBig rows measure the raw scan (no host store for
device-generated data).  This measures the PRODUCT path: host store ->
int8 HBM table -> quantized scan -> f32 host rerank, sequential vs the
pipelined batch_search_stream (the rerank should hide under the next
batch's scan).

Usage: python benchmarks/exp/stream_serve.py [N] [B] [batches]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8 * 1024 * 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    d, k = 128, 10
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    from hnsw_tpu import ExactIndex

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    data = rng.standard_normal((n, d)).astype(np.float32)
    emit({"op": "stream_serve", "n": n, "stage": "host_gen",
          "seconds": round(time.perf_counter() - t0, 1)})
    idx = ExactIndex(metric="cosine", hbm_dtype="int8")
    t0 = time.perf_counter()
    idx.batch_add(np.arange(n), data)
    emit({"op": "stream_serve", "n": n, "stage": "ingest",
          "seconds": round(time.perf_counter() - t0, 1)})
    idx.host_serve_max_batch = 0
    batches = [rng.standard_normal((B, d)).astype(np.float32)
               for _ in range(nb)]
    # warm/compile (+ the one-time int8 sync/transfer)
    t0 = time.perf_counter()
    idx.batch_search_slots(batches[0], k)
    emit({"op": "stream_serve", "n": n, "stage": "sync_plus_compile",
          "seconds": round(time.perf_counter() - t0, 1)})

    t0 = time.perf_counter()
    for q in batches:
        idx.batch_search_slots(q, k)
    seq_s = time.perf_counter() - t0
    emit({"op": "stream_serve", "n": n, "B": B, "batches": nb,
          "variant": "sequential", "qps": round(nb * B / seq_s),
          "ms_batch": round(seq_s / nb * 1e3, 1)})

    t0 = time.perf_counter()
    for _ in idx.batch_search_stream(batches, k):
        pass
    pipe_s = time.perf_counter() - t0
    emit({"op": "stream_serve", "n": n, "B": B, "batches": nb,
          "variant": "pipelined", "qps": round(nb * B / pipe_s),
          "ms_batch": round(pipe_s / nb * 1e3, 1),
          "speedup": round(seq_s / pipe_s, 3)})


if __name__ == "__main__":
    main()
