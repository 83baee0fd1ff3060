"""8M build head-to-head: native AVX-512 sequential vs device waves.

VERDICT r4 item 3: the Graph.build auto crossover above 1M was
extrapolated from converging per-node rates (~1.1k/s host vs ~0.9k/s
device at 8M). This measures the native sequential builder at 8M on
the SAME clustered generator/seed as the round-3 8M device build row
(big_clustered.make_data_device, seed 0; device row: 23457 s incl a
2h14m relay stall, ~9.3 s/wave healthy ≈ 880 nodes/s) and serves the
result through the identical stack (device exact oracle + blockless
pivot graph ladder) for the quality-parity oracle pattern
(/root/reference/hnsw-extensions/parquet/graph_test.go:179-258).

Usage: native8m.py [N] [gen|build|serve|all]
  gen   — device-generate the clustered data + queries, save npy
          (the only TPU phase before serve; the build itself is
          CPU-only and safe to run while the TPU serves other jobs)
  build — native sequential build with checkpoints + deadline
          (HNSW_TPU_ABORT_AT honored; resume by re-running build)
  serve — load the checkpoint (finishing any pending rows), measure
          the exact oracle + graph ladder on device

Appends JSON rows to benchmarks/results_tpu_r4.jsonl (same stream as
big_clustered for side-by-side rows).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from benchmarks.exp.big_clustered import emit, make_data_device  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_388_608
    what = sys.argv[2] if len(sys.argv) > 2 else "all"
    d, k, B = 128, 10, 1024
    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    cdir = os.environ.get("HNSW_TPU_CACHE_DIR", "/root/repo/.ckpt")
    os.makedirs(cdir, exist_ok=True)
    data_path = os.path.join(cdir, f"nat_data_{n}.npy")
    q_path = os.path.join(cdir, f"nat_q_{n}.npy")
    ckpt = os.path.join(cdir, f"nat_graph_{n}.npz")
    abort_at = (float(os.environ["HNSW_TPU_ABORT_AT"])
                if "HNSW_TPU_ABORT_AT" in os.environ else None)

    if what in ("gen", "all") and not os.path.exists(data_path):
        from hnsw_tpu.utils.warmup import warmup_transfers
        warmup_transfers()
        t0 = time.perf_counter()
        data, queries = make_data_device(n, d, B)
        np.save(data_path, data)
        np.save(q_path, queries)
        print(f"# data gen+save: {time.perf_counter() - t0:.0f}s",
              flush=True)
    if what == "gen":
        return

    from hnsw_tpu import Graph

    if what in ("build", "all"):
        from hnsw_tpu.core.build_device import BuildDeadlineExceeded
        t0 = time.perf_counter()
        data = np.load(data_path)
        print(f"# data load: {time.perf_counter() - t0:.0f}s", flush=True)
        g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
        t0 = time.perf_counter()
        try:
            if os.path.exists(ckpt):
                g = Graph.resume_build(ckpt, wave=8192, method="host",
                                       checkpoint_every=256,
                                       abort_deadline=abort_at)
            else:
                # checkpoint_every*wave = 2.1M rows per slice: an 8M
                # host snapshot is an ~18 GB npz (~160 s each) — 3
                # mid-build snapshots is the restartability/overhead
                # balance
                g.build(list(range(n)), data, method="host", wave=8192,
                        checkpoint_path=ckpt, checkpoint_every=256,
                        abort_deadline=abort_at)
        except BuildDeadlineExceeded as e:
            emit({"op": "native_seq_build_partial", "n": n,
                  "kind": "clustered",
                  "seconds": round(time.perf_counter() - t0, 1),
                  "checkpoint": ckpt, "note": str(e)})
            return
        build_s = time.perf_counter() - t0
        emit({"op": "native_seq_build", "n": n, "kind": "clustered",
              "seconds": round(build_s, 1),
              "nodes_per_s": round(n / build_s, 1),
              "note": "AVX-512 host sequential; device row ~880 "
                      "nodes/s healthy (round-3 8M)"})
        if what == "build":
            return
    else:
        t0 = time.perf_counter()
        g = Graph.resume_build(ckpt, wave=8192, method="host",
                               checkpoint_every=256,
                               abort_deadline=abort_at)
        print(f"# ckpt load: {time.perf_counter() - t0:.0f}s", flush=True)

    # ---- serve: identical stack to the device-built 8M row ------------
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp

    from hnsw_tpu.ops.topk import exact_topk

    queries = np.load(q_path)
    g.fast_math = True
    g.hbm_mode = "float16"     # same serving store as the r3 8M row
    g.entry_mode = "pivots"
    g.native_serve_max_batch = 0
    dev = g.device_graph()
    q = jnp.asarray(queries)

    def bench(f, reps=3):
        out = f()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f()
        jax.block_until_ready(out)
        return np.asarray(out[1]), reps * B / (time.perf_counter() - t0)

    # fp16 scan + f32 host rerank is the GT oracle at this scale (same
    # recipe as big_clustered._serve_fp16)
    from hnsw_tpu.utils.rerank import host_rerank
    ii, scan_qps = bench(lambda: exact_topk(
        q, dev.vectors, dev.sq_norms, dev.alive, k=k + 8,
        metric="cosine"))
    _, gt = host_rerank(g.store, "cosine", queries, ii, k)
    emit({"op": "native8m_exact_fp16_rerank", "n": n, "kind": "clustered",
          "qps": round(scan_qps), "recall": 1.0})

    def rec(si):
        return round(sum(len(set(map(int, si[r])) & set(map(int, gt[r])))
                         for r in range(B)) / (B * k), 4)

    # same serving API as the r3 hnsw_fp16_piv rows: batch_search_slots
    # rides the fp16-store host rerank (raw search_graph would cap
    # recall at the fp16 head-ordering noise on tight clusters)
    for ef in (96, 192, 384, 768):
        g.batch_search_slots(queries, k, ef=ef)         # warm/compile
        t0 = time.perf_counter()
        for _ in range(3):
            _, si = g.batch_search_slots(queries, k, ef=ef)
        dt = (time.perf_counter() - t0) / 3
        emit({"op": "native8m_hnsw_piv", "n": n, "kind": "clustered",
              "ef": ef, "qps": round(B / dt), "recall": rec(si),
              "note": "native-built graph; compare hnsw_fp16_piv rows "
                      "(device-built, r3)"})


if __name__ == "__main__":
    main()
