"""IVF at 8M clustered — the partition tier's home regime.

Completes the 8M serving story (big_clustered.py rows): the graph
ladder tops out at 699 qps @ .97 (ef=768) and fast-bf16 exact collapses
to .69 on tight clusters; genuinely clustered data is exactly what the
partition scan (index/ivf.py) is for. Same seeded device-generated
data as big_clustered, so rows are directly comparable.

GT comes from a chunked exact f32 device scan over the same store
(also emitted as the oracle row). Probing all partitions would be
exact too, but _scan_blocks materializes [NB, Qp, C] — 38 GB at
nprobe=P, B=1024 — so the dense scan is the honest oracle.

Usage: big_ivf.py [N] [P] (defaults 8388608 2048)
Appends JSON rows to benchmarks/results_tpu_r3.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from big_clustered import make_data_device  # noqa: E402  (same data)

# CPU smoke runs must not pollute the TPU results file
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "results_cpu_smoke.jsonl"
                   if os.environ.get("HNSW_TPU_FORCE_CPU")
                   else "results_tpu_r3.jsonl")


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_388_608
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    d, k, B = 128, 10, 1024

    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.index.ivf import IVFIndex
    from hnsw_tpu.ops.topk import exact_topk
    from hnsw_tpu.utils.transfer import chunked_put

    t0 = time.perf_counter()
    data, queries = make_data_device(n, d, B)
    print(f"# data gen: {time.perf_counter() - t0:.0f}s", flush=True)

    idx = IVFIndex(num_partitions=P, nprobe="auto", metric="cosine",
                   kmeans_iters=10)
    t0 = time.perf_counter()
    idx.build(list(range(n)), data)
    build_s = time.perf_counter() - t0
    emit({"op": "ivf_build", "n": n, "P": P, "kind": "clustered",
          "seconds": round(build_s, 1)})

    # ---- exact f32 oracle over the same store (GT + oracle row) -----
    t0 = time.perf_counter()
    vecs = chunked_put(data)
    sq = jnp.sum(vecs * vecs, axis=1)
    alive = jnp.ones(n, bool)
    q = jnp.asarray(queries)

    def scan():
        _, ii = exact_topk(q, vecs, sq, alive, k=k, metric="cosine")
        ii.block_until_ready()
        return ii
    gt = np.asarray(scan())
    t0 = time.perf_counter()
    for _ in range(3):
        scan()
    emit({"op": "exact_f32", "n": n, "kind": "clustered",
          "qps": round(3 * B / (time.perf_counter() - t0)),
          "recall": 1.0, "note": "oracle for the IVF rows"})
    del vecs, sq, alive                      # free HBM for the blocks
    gset = [set(map(int, gt[r])) for r in range(B)]

    def rec(keys):
        return round(sum(len({kx for kx in keys[r] if kx is not None}
                             & gset[r]) for r in range(B)) / (B * k), 4)

    # ---- ladder: fixed nprobe rungs + the auto-calibrated pick ------
    t0 = time.perf_counter()
    npb_auto = idx._resolve_nprobe()
    emit({"op": "ivf_auto_nprobe", "n": n, "P": P, "nprobe": npb_auto,
          "calibrate_seconds": round(time.perf_counter() - t0, 1)})
    rungs = sorted({4, 8, 16, 32, npb_auto})
    for npb in rungs:
        keys, _ = idx.batch_search(queries, k, _nprobe=npb)  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            keys, _ = idx.batch_search(queries, k, _nprobe=npb)
        dt = (time.perf_counter() - t0) / 3
        emit({"op": "ivf_clustered", "n": n, "P": P, "nprobe": npb,
              "auto": npb == npb_auto, "qps": round(B / dt),
              "recall": rec(keys)})


if __name__ == "__main__":
    main()
