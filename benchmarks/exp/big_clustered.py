"""8M-scale single-chip clustered build + graph-vs-exact serving.

ROADMAP round-4 lead 1: the regime where the fast exact tier's bf16
scan loses ranking fidelity (tight clusters) and the f32 oracle is
bandwidth-bound — the graph tier with compact jagged upper storage
(core/state.DeviceGraph.nbr_upper tuple) is the contender.

Usage: big_clustered.py [N] [wave] [build|serve|all] [f32|fp16]
  build — generate clustered data, device-build, cache to /tmp
  serve — reload cache, measure exact f32 / fast exact / graph ladder
  all   — both (one process: no relay re-warm between phases)
  fp16  — descent_dtype="float16" build + hbm_mode="float16" serving
          (half the HBM table: the 16M single-chip regime, where the
          f32 table alone is 8.6 GB). Ground truth comes from an fp16
          device scan at k+8 reranked exact-f32 on host (containment
          margin >> fp16 noise at these separations).

Appends JSON rows to benchmarks/results_tpu_r3.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

OUT = os.path.join(os.path.dirname(__file__), "..", "results_tpu_r4.jsonl")


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def make_data_device(n, d, n_q, seed=0, base_too=True):
    """Clustered stand-in generated ON DEVICE (jax.random), pulled to
    host in chunks. The host path below costs ~80 min at 8M x 128 on a
    slow single-core host (~170k gaussians/s measured); the device
    generates a 1M-row chunk in milliseconds and the D2H pull is
    link-bound (~25-30 MB/s relay), ~3 min total at 8M."""
    import jax
    import jax.numpy as jnp
    n_c = max(1, n // 100)
    key = jax.random.PRNGKey(seed)
    kc, kq, kb = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_c, d), jnp.float32) * 5

    import functools

    @functools.partial(jax.jit, static_argnames=("m",))
    def chunk(k, m):
        ka, kn = jax.random.split(k)
        asg = jax.random.randint(ka, (m,), 0, n_c)
        return centers[asg] + 0.3 * jax.random.normal(kn, (m, d),
                                                      jnp.float32)

    base = None
    if base_too:
        base = np.empty((n, d), np.float32)
        step = 1 << 20
        keys = jax.random.split(kb, -(-n // step))
        for i, c0 in enumerate(range(0, n, step)):
            m = min(step, n - c0)
            out = chunk(keys[i], m=step)    # fixed shape: one compile
            base[c0:c0 + m] = np.asarray(out[:m])
    queries = np.asarray(chunk(kq, m=n_q))
    return base, queries


def make_data(n, d, n_q, seed=0, base_too=True):
    """Clustered stand-in, chunked generation (datasets.synthetic_standin
    materializes intermediates; at 8M that is several extra GB).

    ``base_too=False`` generates only the queries — the serve phase
    reloads the graph (whose host store holds the vectors) and this
    host's single slow core takes ~45 min to draw the 8M base
    (measured: 63 s per 10M gaussians under contention)."""
    rng = np.random.default_rng(seed)
    n_c = max(1, n // 100)
    centers = rng.standard_normal((n_c, d)).astype(np.float32) * 5
    base = None
    if base_too:
        base = np.empty((n, d), np.float32)
        for c0 in range(0, n, 1 << 20):
            c1 = min(c0 + (1 << 20), n)
            asg = rng.integers(0, n_c, c1 - c0)
            base[c0:c1] = centers[asg]
            base[c0:c1] += 0.3 * rng.standard_normal(
                (c1 - c0, d)).astype(np.float32)
    # dedicated stream: the query set is identical whether or not the
    # base was drawn (serve-only reruns see the same workload)
    rng_q = np.random.default_rng(seed + 10_007)
    qasg = rng_q.integers(0, n_c, n_q)
    queries = (centers[qasg]
               + 0.3 * rng_q.standard_normal((n_q, d)).astype(np.float32))
    return base, queries


def _serve_partial_fp16(err, queries, n, k, B, wave, fp16):
    """Deadline-aborted build: serve the inserted prefix IN-PROCESS.

    The builder synced host arrays and wrote the checkpoint before
    raising, and attached the graph to the exception — so instead of
    ending the round with an unserved 32 GB checkpoint (the round-4
    failure mode), we tombstone the never-inserted tail and run the
    same fp16 ladder on the N-that-landed. Rows carry the true served
    count; the on-disk checkpoint stays resumable."""
    g = getattr(err, "graph", None)
    if g is None or not fp16:
        return
    n_served = g.mask_pending_for_serve()
    emit({"op": "device_build_partial_served", "n": n,
          "n_served": n_served, "wave": wave, "kind": "clustered",
          "note": "deadline abort; serving the inserted prefix"})
    _serve_fp16(g, queries, n_served, k, B, emit)


def _serve_fp16(g, queries, n, k, B, emit):
    """hbm_mode="float16" capacity serving: fp16 traversal store +
    exact f32 host rerank. GT = fp16 device scan at k+8 reranked
    exact-f32 on host (fp16 noise ~5e-4 << within-cluster separations
    ~4e-3, so k+8 containment holds; the rerank restores f32 order)."""
    import time

    import jax
    import jax.numpy as jnp

    from hnsw_tpu.ops.topk import exact_topk
    from hnsw_tpu.utils.rerank import host_rerank

    g.fast_math = True
    g.hbm_mode = "float16"
    g.native_serve_max_batch = 0
    g.entry_mode = "pivots"
    dev = g.device_graph()           # fp16 store in HBM
    assert str(dev.vectors.dtype) == "float16", dev.vectors.dtype
    q = jnp.asarray(queries)

    def scan():
        _, ii = exact_topk(q, dev.vectors, dev.sq_norms, dev.alive,
                           k=k + 8, metric="cosine")
        ii.block_until_ready()
        return ii
    ii = scan()
    t0 = time.perf_counter()
    for _ in range(3):
        ii = scan()
    scan_dt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    _, gt = host_rerank(g.store, "cosine", queries, np.asarray(ii), k)
    rr_dt = time.perf_counter() - t0
    emit({"op": "exact_fp16_rerank", "n": n, "kind": "clustered",
          "qps": round(B / (scan_dt + rr_dt)), "recall": 1.0,
          "note": "fp16 scan k+8 + f32 host rerank (the GT oracle)"})

    def rec(slots):
        return round(sum(len(set(map(int, slots[r])) &
                             set(map(int, gt[r])))
                         for r in range(B)) / (B * k), 4)

    ladder = tuple(int(x) for x in os.environ.get(
        "HNSW_TPU_EF_LADDER", "96,192,384,768").split(","))
    for ef in ladder:
        g.batch_search_slots(queries, k, ef=ef)         # warm/compile
        t0 = time.perf_counter()
        for _ in range(3):
            _, si = g.batch_search_slots(queries, k, ef=ef)
        dt = (time.perf_counter() - t0) / 3
        emit({"op": "hnsw_fp16_piv", "n": n, "kind": "clustered",
              "ef": ef, "qps": round(B / dt), "recall": rec(si)})


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_388_608
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    what = sys.argv[3] if len(sys.argv) > 3 else "all"
    fp16 = len(sys.argv) > 4 and sys.argv[4] == "fp16"
    d, k, B = 128, 10, 1024
    # one cache per N: the serving mode (f32 ladder vs fp16 tier) is
    # orthogonal to how the graph was built, so `serve fp16` can reuse
    # an f32-descent build and vice versa (the build row records the
    # descent dtype).
    # HNSW_TPU_CACHE_DIR: /tmp is wiped between rounds — a multi-round
    # build (16M) must checkpoint inside the repo (gitignored .ckpt/)
    # so Graph.resume_build can pick it up next round.
    cdir = os.environ.get("HNSW_TPU_CACHE_DIR", "/tmp")
    os.makedirs(cdir, exist_ok=True)
    cache = os.path.join(cdir, f"gbig_clustered_{n}.npz")

    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu import Graph
    from hnsw_tpu.ops.topk import exact_topk

    t0 = time.perf_counter()
    gen = (make_data if os.environ.get("HNSW_TPU_HOST_GEN")
           else make_data_device)
    data, queries = gen(n, d, B, base_too=what != "serve")
    print(f"# data gen: {time.perf_counter() - t0:.0f}s", flush=True)

    # HNSW_TPU_ABORT_AT (absolute epoch seconds): vacate the TPU by a
    # hard deadline — the build checkpoints and raises, and we emit a
    # partial-build row instead of riding past the round-end margin.
    abort_at = (float(os.environ["HNSW_TPU_ABORT_AT"])
                if "HNSW_TPU_ABORT_AT" in os.environ else None)

    if what in ("build", "all"):
        from hnsw_tpu.core.build_device import BuildDeadlineExceeded
        g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
        t0 = time.perf_counter()
        # restartable: a wedged relay or a kill loses <= checkpoint_every
        # waves, not the whole multi-hour run (Graph.resume_build picks
        # it up from `cache`, which doubles as the checkpoint — the
        # final checkpoint IS the complete serving cache). A full
        # save_graph is ~115 MB/s of npz, so stretch the interval at
        # 16M (each snapshot ~320 s there vs ~160 s at 8M).
        try:
            g.build(list(range(n)), data, wave=wave, method="device",
                    quant_descent=False,
                    descent_dtype="float16" if fp16 else "float32",
                    checkpoint_path=cache,
                    checkpoint_every=int(os.environ.get(
                        "HNSW_TPU_CKPT_EVERY",
                        256 if n > 10_000_000 else 128)),
                    abort_deadline=abort_at)
        except BuildDeadlineExceeded as e:
            emit({"op": "device_build_partial", "n": n, "wave": wave,
                  "kind": "clustered",
                  "descent_dtype": "float16" if fp16 else "float32",
                  "seconds": round(time.perf_counter() - t0, 1),
                  "checkpoint": cache, "note": str(e)})
            _serve_partial_fp16(e, queries, n, k, B, wave, fp16)
            return
        build_s = time.perf_counter() - t0
        emit({"op": "device_build", "n": n, "wave": wave,
              "kind": "clustered", "quant_descent": False,
              "descent_dtype": "float16" if fp16 else "float32",
              "compact_upper": True, "seconds": round(build_s, 1)})
        if what == "build":
            return
    else:
        # resume_build: a finished checkpoint just loads; a partial one
        # (killed/wedged build) finishes its remaining waves first — a
        # serve run can never silently measure a half-built graph.
        # abort_deadline/checkpoint_every ride along: the documented 16M
        # resume command IS this branch, and it must honor
        # HNSW_TPU_ABORT_AT exactly like the build branch (a resumed
        # multi-hour build past round end would block the single-client
        # relay for the driver's bench).
        from hnsw_tpu.core.build_device import BuildDeadlineExceeded
        t0 = time.perf_counter()
        try:
            g = Graph.resume_build(
                cache, wave=wave,
                descent_dtype="float16" if fp16 else "float32",
                checkpoint_every=int(os.environ.get(
                    "HNSW_TPU_CKPT_EVERY",
                    256 if n > 10_000_000 else 128)),
                abort_deadline=abort_at)
        except BuildDeadlineExceeded as e:
            emit({"op": "device_build_partial", "n": n, "wave": wave,
                  "kind": "clustered",
                  "descent_dtype": "float16" if fp16 else "float32",
                  "seconds": round(time.perf_counter() - t0, 1),
                  "checkpoint": cache, "note": str(e)})
            _serve_partial_fp16(e, queries, n, k, B, wave, fp16)
            return
        print(f"# cache load: {time.perf_counter() - t0:.0f}s", flush=True)

    if fp16:
        _serve_fp16(g, queries, n, k, B, emit)
        return

    # ---- serving: exact f32 oracle (ground truth + oracle qps) ---------
    g.fast_math = True
    dev = g.device_graph()           # normalized f32 store in HBM
    q = jnp.asarray(queries)

    def bench(f, reps=3):
        out = f()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f()
        jax.block_until_ready(out)
        return np.asarray(out[1]), reps * B / (time.perf_counter() - t0)

    gt, oracle_qps = bench(lambda: exact_topk(
        q, dev.vectors, dev.sq_norms, dev.alive, k=k, metric="cosine"))
    emit({"op": "exact_f32", "n": n, "kind": "clustered",
          "qps": round(oracle_qps), "recall": 1.0})

    def rec(ii):
        return round(sum(len(set(map(int, ii[r])) & set(map(int, gt[r])))
                         for r in range(B)) / (B * k), 4)

    ii, fast_qps = bench(lambda: exact_topk(
        q, dev.vectors, dev.sq_norms, dev.alive, k=k, metric="cosine",
        fast_math=True))
    emit({"op": "exact_fast", "n": n, "kind": "clustered",
          "qps": round(fast_qps), "recall": rec(ii)})

    # ---- graph ladder: pivots entry, f32 rows, bitonic merge -----------
    from hnsw_tpu.core.search import pivot_seeds, search_graph
    g.entry_mode = "pivots"
    pids, pvecs, psq = g._pivot_arrays()
    for ef, E in ((96, 2), (192, 2), (384, 2), (768, 4)):
        H = max(128, 2 * ef // E)
        seeds = pivot_seeds(q, pvecs, psq, pids,
                            s=min(g.seed_width, max(ef, k)),
                            metric="cosine", fast_math=True)

        def f():
            return search_graph(dev, q, k=k, ef=ef, metric="cosine",
                                max_hops=H, fast_math=True, expand=E,
                                seed_ids=seeds, merge=g.merge_strategy,
                                store_normalized=True)
        ii, qps = bench(f)
        emit({"op": "hnsw_blockless_piv", "n": n, "kind": "clustered",
              "ef": ef, "expand": E, "qps": round(qps),
              "recall": rec(ii)})


if __name__ == "__main__":
    main()
