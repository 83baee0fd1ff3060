"""Large-scale device build + quality curve (VERDICT item 5).

Usage: scale_build.py [N] [wave] [random|clustered] [quant|noquant] [all|graph|ivf]
Builds N x 128 f32 on-device, then measures exact qps, graph
recall/qps at an ef ladder, and IVF.  `ivf` skips the graph build
(ground truth comes from a raw exact scan).
Appends JSON rows to benchmarks/results_tpu_r2.jsonl.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    kind = sys.argv[3] if len(sys.argv) > 3 else "random"
    quant = len(sys.argv) > 4 and sys.argv[4] == "quant"
    what = sys.argv[5] if len(sys.argv) > 5 else "all"
    d, k = 128, 10
    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu import Graph
    from hnsw_tpu.core.search import search_graph
    from hnsw_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(0)
    if kind == "clustered":
        from benchmarks.datasets import synthetic_standin
        data, _ = synthetic_standin(n, d, 1, seed=0, kind="clustered")
    else:
        data = rng.standard_normal((n, d)).astype(np.float32)
    B = 1024
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

    def bench_exact(vecs, sq, alive):
        f = lambda: exact_topk(q, vecs, sq, alive, k=k, metric="cosine")
        dd, ii = f()
        jax.block_until_ready(ii)
        t0 = time.perf_counter()
        for _ in range(3):
            dd, ii = f()
        jax.block_until_ready(ii)
        return np.asarray(ii), 3 * B / (time.perf_counter() - t0)

    if what in ("all", "graph"):
        g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
        t0 = time.perf_counter()
        g.build(list(range(n)), data, wave=wave, method="device",
                quant_descent=quant)
        build_s = time.perf_counter() - t0
        emit({"op": "device_build", "n": n, "wave": wave, "kind": kind,
              "quant_descent": quant, "seconds": round(build_s, 1)})
        if n >= 200_000:  # cache: serving reruns skip the long build
            from hnsw_tpu.io.codec import save_graph
            try:
                save_graph(g, f"/tmp/g1m_{kind}_{n}.npz")
            except Exception as e:  # cache is best-effort
                print(f"# graph cache save failed: {e}", flush=True)
        dev = g.device_graph()
        gt, exact_qps = bench_exact(dev.vectors, dev.sq_norms, dev.alive)
    else:
        vd = jnp.asarray(data)
        sq = jnp.sum(vd * vd, axis=1)
        gt, exact_qps = bench_exact(vd, sq, jnp.ones((n,), bool))
        del vd, sq
    emit({"op": "exact", "n": n, "kind": kind, "qps": round(exact_qps),
          "recall": 1.0})

    if what in ("all", "graph"):
        for ef, E in ((96, 2), (192, 2), (384, 2), (768, 4), (1536, 8)):
            H = max(128, 2 * ef // E)
            f = lambda: search_graph(dev, q, k=k, ef=ef, metric="cosine",
                                     max_hops=H, fast_math=True, expand=E)
            dd, ii = f()
            jax.block_until_ready(ii)
            t0 = time.perf_counter()
            for _ in range(3):
                dd, ii = f()
            jax.block_until_ready(ii)
            dt = (time.perf_counter() - t0) / 3
            ii = np.asarray(ii)
            hits = sum(len(set(map(int, ii[r])) & set(map(int, gt[r])))
                       for r in range(B))
            emit({"op": "hnsw", "n": n, "kind": kind, "ef": ef, "expand": E,
                  "qps": round(B / dt), "recall": round(hits / (B * k), 4)})
    if what == "graph":
        return

    # IVF tier (the large-N strategy; shines on clustered data)
    from hnsw_tpu.index.ivf import IVFIndex
    P = max(64, n // 4096)
    ivf = IVFIndex(num_partitions=P, nprobe=8, kmeans_iters=5)
    t0 = time.perf_counter()
    ivf.build(list(range(n)), data)
    emit({"op": "ivf_build", "n": n, "kind": kind, "partitions": P,
          "seconds": round(time.perf_counter() - t0, 1)})
    qn = np.asarray(q)
    for nprobe in (4, 16, 64):
        if nprobe > P:
            continue
        ivf.nprobe = nprobe
        ivf.batch_search(qn, k)  # warm
        t0 = time.perf_counter()
        keys, _ = ivf.batch_search(qn, k)
        dt = time.perf_counter() - t0
        hits = sum(len({kk for kk in keys[r] if kk is not None}
                       & set(map(int, gt[r]))) for r in range(B))
        emit({"op": "ivf", "n": n, "kind": kind, "nprobe": nprobe,
              "qps": round(B / dt), "recall": round(hits / (B * k), 4)})


if __name__ == "__main__":
    main()
