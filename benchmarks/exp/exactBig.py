"""Capacity-mode exact serving beyond f32 HBM: 20M bf16 / 33M int8.

The exact tier's hbm_dtype modes (index/exact.py) store the device
table reduced-precision and restore exact ordering with one batched f32
host rerank.  This measures the SCAN at table sizes no f32 table can
reach on a 16 GB chip:

  bf16: 320 x 65536 = 20,971,520 rows x 128 d  (5.4 GB table)
  int8: 512 x 65536 = 33,554,432 rows x 128 d  (4.3 GB table)

Data is generated on device chunk-by-chunk; each chunk's EXACT f32
top-k vs the fixed query set is accumulated on host BEFORE the chunk is
quantized and the f32 source discarded — so ground truth is exact even
though no f32 copy of the table ever exists.  Recall is reported two
ways: no-rerank (take top-k of the approx scan) and after-rerank
(fraction of true top-k present in the k+margin candidate pool — the
host rerank restores exact ordering, so containment IS the post-rerank
recall).

Usage: python benchmarks/exp/exactBig.py [bf16|int8] [n_chunks] [B]
Appends rows to benchmarks/results_tpu_r3.jsonl.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

OUT = os.path.join(os.path.dirname(__file__), "..", "results_tpu_r3.jsonl")
CHUNK = 65536


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "int8"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else \
        (512 if dtype == "int8" else 320)
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    d, k = 128, 10
    margin = 16 if dtype == "int8" else 4
    kk = k + margin
    n = n_chunks * CHUNK

    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.ops.topk import exact_topk, quantized_topk_candidates

    key = jax.random.PRNGKey(7)
    kq, key = jax.random.split(key)
    q = jax.random.normal(kq, (B, d), jnp.float32)

    @jax.jit
    def make_chunk(ck):
        v = jax.random.normal(ck, (CHUNK, d), jnp.float32)
        sq = jnp.sum(v * v, axis=-1)
        if dtype == "int8":
            amax = jnp.max(jnp.abs(v), axis=-1)
            s = jnp.where(amax > 0, amax / 127.0, 1.0)
            tab = jnp.clip(jnp.round(v / s[:, None]), -127, 127
                           ).astype(jnp.int8)
        else:
            s = jnp.zeros((CHUNK,), jnp.float32)
            tab = v.astype(jnp.bfloat16)
        return v, sq, s, tab

    # Preallocate the table ONCE and place chunks with a DONATED
    # dynamic_update_slice — a 512-operand concatenate tree-copies and
    # OOMs (first int8 run: RESOURCE_EXHAUSTED at the concat).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def place(table, chunk, row0):
        return jax.lax.dynamic_update_slice(table, chunk, (row0, 0))

    table = jnp.zeros((n, d),
                      jnp.int8 if dtype == "int8" else jnp.bfloat16)
    alive_c = jnp.ones((CHUNK,), bool)
    gt_d = np.full((B, k), np.inf, np.float32)
    gt_i = np.full((B, k), -1, np.int64)
    sqs, scs = [], []
    t0 = time.perf_counter()
    for c in range(n_chunks):
        ck, key = jax.random.split(key)
        v, sq, s, tab = make_chunk(ck)
        dd, ii = exact_topk(q, v, sq, alive_c, k=k, metric="cosine")
        dd = np.asarray(dd)
        ii = np.asarray(ii) + c * CHUNK
        cat_d = np.concatenate([gt_d, dd], axis=1)
        cat_i = np.concatenate([gt_i, ii], axis=1)
        part = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
        gt_d = np.take_along_axis(cat_d, part, axis=1)
        gt_i = np.take_along_axis(cat_i, part, axis=1)
        table = place(table, tab, c * CHUNK)
        sqs.append(np.asarray(sq))
        scs.append(np.asarray(s))
        if c % 64 == 0:
            print(f"# chunk {c}/{n_chunks} @ "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
    v_sq = jnp.asarray(np.concatenate(sqs))
    scales = jnp.asarray(np.concatenate(scs)) if dtype == "int8" \
        else None
    alive = jnp.ones((n,), bool)
    emit({"op": "exactBig", "dtype": dtype, "n": n, "B": B,
          "stage": "gen_plus_gt", "seconds":
          round(time.perf_counter() - t0, 1)})

    f = lambda: quantized_topk_candidates(q, table, scales, v_sq,
                                          alive, kk=kk, metric="cosine")
    dc, ic = f()
    jax.block_until_ready(ic)
    t0 = time.perf_counter()
    for _ in range(3):
        dc, ic = f()
    jax.block_until_ready(ic)
    dt = (time.perf_counter() - t0) / 3
    ic = np.asarray(ic)
    gt_sets = [set(gt_i[r]) for r in range(B)]
    rec_nr = np.mean([len(set(ic[r, :k]) & gt_sets[r]) / k
                      for r in range(B)])
    rec_rr = np.mean([len(set(ic[r]) & gt_sets[r]) / k
                      for r in range(B)])
    emit({"op": "exactBig", "dtype": dtype, "n": n, "B": B, "kk": kk,
          "qps": round(B / dt), "ms_batch": round(dt * 1e3, 1),
          "recall_norerank": round(float(rec_nr), 5),
          "recall_after_rerank": round(float(rec_rr), 5)})


if __name__ == "__main__":
    main()
