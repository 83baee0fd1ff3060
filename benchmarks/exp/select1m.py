"""Dissect the exact tier at 1M: matmul vs selection cost.

Hypothesis (batch5): XLA's exact TopK costs ~k extraction passes per
chunk and dominates the scan; the TPU hardware approx_min_k
(PartialReduce) is one pass. Ablates, at 1M x 128 B=8192 chunk=16384:

  scan_f32_min      chunked HIGHEST matmul + row-min only (selection-free floor)
  scan_f32_topk     + exact lax.top_k k=10 per chunk   (oracle as shipped)
  scan_f32_approx   + approx_min_k kk=26 per chunk
  scan_bf16_min     chunked bf16 matmul + row-min only
  e2e_oracle        exact_topk(fast_math=False)
  e2e_fast          exact_topk(fast_math=True)  [bf16 + approx + f32 rerank]

Appends rows to benchmarks/results_tpu_r2.jsonl and prints recall of
e2e_fast vs e2e_oracle.
"""
import functools
import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "results_tpu_r2.jsonl")


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    if os.environ.get("HNSW_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.ops.distance import INF_DIST, _epilogue
    from hnsw_tpu.ops.topk import exact_topk, merge_topk, topk_smallest

    n, d, k, B, CH = 1_000_000, 128, 10, 8192, 16384
    if os.environ.get("SELECT1M_SMALL"):
        n, B, CH = 40_000, 256, 8192
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.sum(data.astype(np.float64) * data, axis=1).astype(np.float32)
    v = jnp.asarray(data)
    s = jnp.asarray(sq)
    alive = jnp.ones((n,), bool)
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

    nc = n // CH  # 1M divides evenly at 16384? 1M/16384 = 61.03 -> pad
    npad = ((n + CH - 1) // CH) * CH
    vp = jnp.pad(v, ((0, npad - n), (0, 0)))
    sp = jnp.pad(s, (0, npad - n))
    vc = vp.reshape(npad // CH, CH, d)
    sc = sp.reshape(npad // CH, CH)

    @functools.partial(jax.jit, static_argnames=("sel", "prec"))
    def scan(q, vc, sc, sel: str, prec: str):
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1)

        def body(carry, xs):
            vec, vsq = xs
            if prec == "bf16":
                gram = jax.lax.dot_general(
                    qf.astype(jnp.bfloat16), vec.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                gram = jax.lax.dot_general(
                    qf, vec, dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            dist = _epilogue("cosine", gram, q_sq, vsq)
            if sel == "min":
                red = jnp.minimum(carry, jnp.min(dist, axis=1))
                return red, None
            if sel == "topk":
                dk, _ = topk_smallest(dist, k)
            else:
                dk, _ = jax.lax.approx_min_k(dist, k + 16,
                                             recall_target=0.95)
            red = jnp.minimum(carry, dk[:, 0])
            return red, None

        init = jnp.full((B,), INF_DIST, jnp.float32)
        red, _ = jax.lax.scan(body, init, (vc, sc))
        return red

    def bench(tag, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        emit({"op": "select1m", "variant": tag, "qps": round(B / dt),
              "ms_batch": round(dt * 1e3, 1)})
        return out

    bench("scan_f32_min", lambda: scan(q, vc, sc, "min", "f32"))
    bench("scan_f32_topk", lambda: scan(q, vc, sc, "topk", "f32"))
    bench("scan_f32_approx", lambda: scan(q, vc, sc, "approx", "f32"))
    bench("scan_bf16_min", lambda: scan(q, vc, sc, "min", "bf16"))
    bench("scan_bf16_approx", lambda: scan(q, vc, sc, "approx", "bf16"))

    gt = bench("e2e_oracle",
               lambda: exact_topk(q, v, s, alive, k=k, metric="cosine"))
    ii = bench("e2e_fast",
               lambda: exact_topk(q, v, s, alive, k=k, metric="cosine",
                                  fast_math=True))
    gt_i, fa_i = np.asarray(gt[1]), np.asarray(ii[1])
    rec = np.mean([len(set(fa_i[r]) & set(gt_i[r])) / k for r in range(B)])
    emit({"op": "select1m", "variant": "e2e_fast_recall",
          "recall": round(float(rec), 5)})


if __name__ == "__main__":
    main()
