"""Single-query host-latency micro: native graph beam (descent vs
pivot-seeded) and the native fused exact scan at 10k x 128 — the
round-4 item-1 instrument.

CPU-only (forces jax to cpu so the relay is untouched).

r4 baseline (pre-SIMD): graph ef=384 p50 1.302 ms @ .9961;
numpy exact host scan p50 0.440 ms @ 1.0. Reference anchor: adaptive
hybrid 2.51 ms avg @ .98 (hybrid/README.md:650).
"""
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hnsw_tpu import Graph
from hnsw_tpu.index.exact import ExactIndex
from hnsw_tpu.ops.topk import np_exact_topk


def _graph_rungs(g, queries, gt, k):
    for ef in (64, 96, 128, 192, 256, 384):
        lats, hits = [], 0
        g.search(queries[0], k, ef=ef)  # warm
        for qi in range(256):
            t1 = time.perf_counter()
            res = g.search(queries[qi], k, ef=ef)
            lats.append(time.perf_counter() - t1)
            hits += len({kk for kk, _ in res} & set(map(int, gt[qi])))
        p50 = sorted(lats)[128] * 1e3
        mean = sum(lats) / len(lats) * 1e3
        print(f"  graph ef={ef}: p50 {p50:.3f} ms mean {mean:.3f} ms  "
              f"recall {hits / 2560:.4f}")


def main():
    n, d, k = 10_000, 128, 10
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((512, d)).astype(np.float32)
    gt_d, gt = np_exact_topk(queries, data, k, "cosine")

    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data, method="host")
    print(f"host build: {time.perf_counter() - t0:.1f}s")

    for mode in ("descent", "pivots"):
        g.entry_mode = mode
        print(f"-- entry_mode={mode}")
        _graph_rungs(g, queries, gt, k)

    ex = ExactIndex(metric="cosine")
    ex.batch_add(list(range(n)), data)
    lats, hits = [], 0
    ex.search(queries[0], k)  # warm (builds the scan sidecar)
    for qi in range(256):
        t1 = time.perf_counter()
        res = ex.search(queries[qi], k)
        lats.append(time.perf_counter() - t1)
        hits += len({kk for kk, _ in res} & set(map(int, gt[qi])))
    p50 = sorted(lats)[128] * 1e3
    mean = sum(lats) / len(lats) * 1e3
    kind = "native fused" if ex._host_scan is not None else "numpy"
    dt = (ex._host_scan["rows"].dtype if ex._host_scan is not None
          else "f32")
    print(f"exact host scan ({kind}, {dt}): p50 {p50:.3f} ms "
          f"mean {mean:.3f} ms  recall {hits / 2560:.4f}")


if __name__ == "__main__":
    main()
