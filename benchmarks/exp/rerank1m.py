"""Dissect the fast exact tier's FINAL stage at 1M (ROADMAP item 3).

select1m showed e2e_fast = 62.6 ms/batch vs a 32.3 ms bf16 scan floor
(B=8192, k=10, chunk=16384): the ~30 ms gap is per-chunk approx
selection + the stacked final select + the f32 winner-row gather rerank.
Ablates the candidates for closing it:

  asis            exact_topk(fast_math=True) as shipped (kk=k+16, f32 rerank)
  int8scan        int8 MXU scan (quantized table + queries, int32 gram,
                  ~2x bf16 peak on v5e) + approx select + f32 rerank
  norerank        bf16 distances all the way: exact top_k over the stacked
                  winners, no rerank gather (recall may dip at the boundary)
  rerank_final    select k (not kk) from the stack, rerank only those k rows
                  (exact returned distances; set fixed by bf16 ordering)
  margin4/8       kk = k+4 / k+8 instead of k+16 (smaller stack + gather)
  chunk32k/64k    chunk = 32768 / 65536 (fewer per-chunk select passes)
  b16384          B = 16384 at the shipped config (batch amortization)

Each variant reports qps + recall@10 vs the f32 oracle. Appends rows to
benchmarks/results_tpu_r2.jsonl.
"""
import functools
import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "results_tpu_r2.jsonl")


def emit(rec):
    rec["ts"] = time.time()
    # smoke-test runs (CPU / tiny sizes) must not pollute the TPU log
    if not os.environ.get("RERANK1M_SMALL"):
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
    from hnsw_tpu.ops.distance import INF_DIST, _epilogue, gathered_dist
    from hnsw_tpu.ops.topk import exact_topk, topk_smallest

    n, d, k, B = 1_000_000, 128, 10, 8192
    if os.environ.get("RERANK1M_SMALL"):
        n, B = 40_000, 256
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.sum(data.astype(np.float64) * data, axis=1).astype(np.float32)
    v = jnp.asarray(data)
    s = jnp.asarray(sq)
    alive = jnp.ones((n,), bool)
    q_host = rng.standard_normal((16384, d)).astype(np.float32)
    q = jnp.asarray(q_host[:B])

    # f32 oracle ground truth (chunked scan, exact selection)
    gt_d, gt_i = exact_topk(q, v, s, alive, k=k, metric="cosine")
    gt_i = np.asarray(gt_i)

    @functools.partial(
        jax.jit, static_argnames=("kk", "chunk", "final", "rerank"))
    def fast(q, v, s, kk: int, chunk: int, final: str, rerank: str):
        """Standalone fast scan: bf16 matmul + approx_min_k(kk) per chunk,
        stacked winners, one final select, optional rerank."""
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1)
        npad = ((n + chunk - 1) // chunk) * chunk
        vp = jnp.pad(v, ((0, npad - n), (0, 0)))
        sp = jnp.pad(s, (0, npad - n))
        vc = vp.reshape(npad // chunk, chunk, d)
        sc = sp.reshape(npad // chunk, chunk)
        mask = (jnp.arange(npad) < n).reshape(npad // chunk, chunk)
        bases = jnp.arange(npad // chunk, dtype=jnp.int32) * chunk

        def body(_, xs):
            vec, vsq, vld, base = xs
            gram = jax.lax.dot_general(
                qf.astype(jnp.bfloat16), vec.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dist = jnp.where(vld[None, :],
                             _epilogue("cosine", gram, q_sq, vsq), INF_DIST)
            dk, ik = jax.lax.approx_min_k(dist, kk, recall_target=0.95)
            return 0, (dk, ik + base)

        _, (dks, iks) = jax.lax.scan(body, 0, (vc, sc, mask, bases))
        d_all = jnp.moveaxis(dks, 0, 1).reshape(q.shape[0], -1)
        i_all = jnp.moveaxis(iks, 0, 1).reshape(q.shape[0], -1)
        n_sel = k if final == "k" else kk
        dk, pos = jax.lax.approx_min_k(d_all, n_sel, recall_target=0.95)
        ik = jnp.take_along_axis(i_all, pos, axis=1)
        if rerank == "f32":
            safe = jnp.clip(ik, 0, n - 1)
            cv = v[safe].astype(jnp.float32)
            csq = s[safe]
            dd = gathered_dist(qf, cv, csq, q_sq, metric="cosine",
                               precision=jax.lax.Precision.HIGHEST)
            dd = jnp.where(ik >= 0, dd, INF_DIST)
            dk, pos2 = topk_smallest(dd, min(k, dd.shape[1]))
            ik = jnp.take_along_axis(ik, pos2, axis=1)
        else:  # order by bf16 distance
            dk2, pos2 = topk_smallest(dk, min(k, dk.shape[1]))
            ik = jnp.take_along_axis(ik, pos2, axis=1)
            dk = dk2
        return dk[:, :k], ik[:, :k]

    # int8 table (per-vector scale) built once, outside the timed fn
    vs8_scale = np.max(np.abs(data), axis=1) / 127.0
    v8_host = np.clip(np.rint(data / np.maximum(vs8_scale, 1e-30)[:, None]),
                      -127, 127).astype(np.int8)
    v8 = jnp.asarray(v8_host)
    vs8 = jnp.asarray(vs8_scale.astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("kk", "chunk"))
    def int8scan(q, v8, vs8, v, s, kk: int, chunk: int):
        """int8 x int8 -> int32 gram chunked scan; f32 rerank."""
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1)
        qscale = jnp.max(jnp.abs(qf), axis=1) / 127.0
        q8 = jnp.clip(jnp.round(qf / jnp.maximum(qscale, 1e-30)[:, None]),
                      -127, 127).astype(jnp.int8)
        npad = ((n + chunk - 1) // chunk) * chunk
        v8p = jnp.pad(v8, ((0, npad - n), (0, 0)))
        vs8p = jnp.pad(vs8, (0, npad - n))
        sp = jnp.pad(s, (0, npad - n))
        vc = v8p.reshape(npad // chunk, chunk, d)
        sc8 = vs8p.reshape(npad // chunk, chunk)
        sqc = sp.reshape(npad // chunk, chunk)
        mask = (jnp.arange(npad) < n).reshape(npad // chunk, chunk)
        bases = jnp.arange(npad // chunk, dtype=jnp.int32) * chunk

        def body(_, xs):
            vec8, vsc, vsq, vld, base = xs
            gram = jax.lax.dot_general(
                q8, vec8, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            qv = gram.astype(jnp.float32) * (qscale[:, None] * vsc[None, :])
            dist = jnp.where(vld[None, :],
                             _epilogue("cosine", qv, q_sq, vsq), INF_DIST)
            dk, ik = jax.lax.approx_min_k(dist, kk, recall_target=0.95)
            return 0, (dk, ik + base)

        _, (dks, iks) = jax.lax.scan(body, 0, (vc, sc8, sqc, mask, bases))
        d_all = jnp.moveaxis(dks, 0, 1).reshape(q.shape[0], -1)
        i_all = jnp.moveaxis(iks, 0, 1).reshape(q.shape[0], -1)
        dk, pos = jax.lax.approx_min_k(d_all, kk, recall_target=0.95)
        ik = jnp.take_along_axis(i_all, pos, axis=1)
        safe = jnp.clip(ik, 0, n - 1)
        dd = gathered_dist(qf, v[safe].astype(jnp.float32), s[safe], q_sq,
                           metric="cosine",
                           precision=jax.lax.Precision.HIGHEST)
        dd = jnp.where(ik >= 0, dd, INF_DIST)
        dk, pos2 = topk_smallest(dd, min(k, dd.shape[1]))
        return dk, jnp.take_along_axis(ik, pos2, axis=1)

    def bench(tag, fn, queries, gt):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        ii = np.asarray(out[1])
        rec = np.mean([len(set(ii[r]) & set(gt[r])) / k
                       for r in range(len(gt))])
        emit({"op": "rerank1m", "variant": tag,
              "qps": round(queries.shape[0] / dt),
              "ms_batch": round(dt * 1e3, 1),
              "recall": round(float(rec), 5)})

    CH = 16384
    bench("asis", lambda: exact_topk(q, v, s, alive, k=k, metric="cosine",
                                     fast_math=True), q, gt_i)
    bench("norerank",
          lambda: fast(q, v, s, kk=k + 16, chunk=CH, final="kk",
                       rerank="none"), q, gt_i)
    bench("rerank_final",
          lambda: fast(q, v, s, kk=k + 16, chunk=CH, final="k",
                       rerank="f32"), q, gt_i)
    bench("margin4", lambda: fast(q, v, s, kk=k + 4, chunk=CH, final="kk",
                                  rerank="f32"), q, gt_i)
    bench("margin8", lambda: fast(q, v, s, kk=k + 8, chunk=CH, final="kk",
                                  rerank="f32"), q, gt_i)
    bench("chunk32k", lambda: fast(q, v, s, kk=k + 16, chunk=32768,
                                   final="kk", rerank="f32"), q, gt_i)
    bench("chunk64k", lambda: fast(q, v, s, kk=k + 16, chunk=65536,
                                   final="kk", rerank="f32"), q, gt_i)
    bench("int8scan", lambda: int8scan(q, v8, vs8, v, s, kk=k + 16,
                                       chunk=CH), q, gt_i)
    if not os.environ.get("RERANK1M_SMALL"):
        q2 = jnp.asarray(q_host)
        gt2_d, gt2_i = exact_topk(q2, v, s, alive, k=k, metric="cosine")
        gt2_i = np.asarray(gt2_i)
        bench("b16384", lambda: exact_topk(q2, v, s, alive, k=k,
                                           metric="cosine",
                                           fast_math=True), q2, gt2_i)


if __name__ == "__main__":
    main()
