"""Native-vs-device serving crossover on the real chip.

The latency tier (Graph.native_serve_max_batch) routes small batches to
the native C++ engine; the device path amortizes its dispatch + relay
RTT over large batches. This measures both sides over a batch ladder at
10k x 128 and prints the measured crossover, so the default threshold
is a measurement, not a guess (VERDICT r3 item 1).

Usage: python benchmarks/exp/native_crossover.py [n]
Appends JSON rows to benchmarks/results_tpu_r3.jsonl.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    d, k, ef = 128, 10, 96
    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax

    from hnsw_tpu import Graph, native

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((1024, d)).astype(np.float32)
    g = Graph(m=16, metric="cosine", seed=0)
    g.build(list(range(n)), data)
    g.fast_math = True
    platform = jax.devices()[0].platform

    crossover = None
    for B in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
        qb = queries[:B]
        # native side
        native.search_batch(g.host, qb, k, ef)
        t0 = time.perf_counter()
        reps = max(3, 64 // B)
        for _ in range(reps):
            native.search_batch(g.host, qb, k, ef)
        dt_nat = (time.perf_counter() - t0) / reps
        # device side (force past the latency tier)
        old = g.native_serve_max_batch
        g.native_serve_max_batch = 0
        try:
            g.batch_search_slots(qb, k, ef=ef)
            t0 = time.perf_counter()
            for _ in range(reps):
                g.batch_search_slots(qb, k, ef=ef)
            dt_dev = (time.perf_counter() - t0) / reps
        finally:
            g.native_serve_max_batch = old
        emit({"op": "native_crossover", "n": n, "B": B, "ef": ef,
              "native_ms": round(dt_nat * 1000, 3),
              "device_ms": round(dt_dev * 1000, 3),
              "platform": platform})
        if crossover is None and dt_dev < dt_nat:
            crossover = B
    emit({"op": "native_crossover_point", "n": n, "ef": ef,
          "first_B_where_device_wins": crossover, "platform": platform})


if __name__ == "__main__":
    main()
