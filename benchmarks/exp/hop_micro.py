"""Microbenchmark: hop gather strategies on the real TPU.

Hypothesis: the per-hop cost is gather ISSUE-RATE bound (rows/s), so an
inline neighbor-block layout (one [M,D] contiguous block per expanded
node -> B*E fat gathers) beats the row layout (B*E*M thin gathers),
and int8 shrinks bytes 4x on top.
"""
import time
import sys

import numpy as np


def main():
    from hnsw_tpu.utils.warmup import warmup_transfers
    t0 = time.perf_counter()
    warmup_transfers()
    print(f"# warmup {time.perf_counter()-t0:.0f}s", flush=True)

    import jax
    import jax.numpy as jnp

    cap, D, B, E, M = 16384, 128, 1024, 8, 32
    T = 32  # hops per timed call (amortize dispatch)
    rng = np.random.default_rng(0)

    V32 = jnp.asarray(rng.standard_normal((cap, D)).astype(np.float32))
    V16 = V32.astype(jnp.bfloat16)
    V8 = jnp.asarray(rng.integers(-127, 128, (cap, D), dtype=np.int8))
    # inline layouts: [cap, M, D]
    I8 = jnp.asarray(rng.integers(-127, 128, (cap, M, D), dtype=np.int8))
    I16 = jnp.asarray(rng.standard_normal((cap, M, D)).astype(np.float32)).astype(jnp.bfloat16)
    I32f = jnp.asarray(rng.standard_normal((cap, M, D)).astype(np.float32))
    SC = jnp.asarray(rng.random((cap, M)).astype(np.float32))

    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    idx_rows = jnp.asarray(rng.integers(0, cap, (T, B, E * M), dtype=np.int32))
    idx_blk = jnp.asarray(rng.integers(0, cap, (T, B, E), dtype=np.int32))

    def bench(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps / T
        print(f"{name:34s} {dt*1e3:8.3f} ms/hop", flush=True)
        return dt

    def row_gather(V, idx_all, q):
        def hop(acc, idx):
            cv = V[idx]                      # [B, E*M, D]
            d = jnp.einsum("bd,bcd->bc", q, cv.astype(jnp.float32),
                           precision=jax.lax.Precision.DEFAULT)
            return acc + jnp.sum(d), None
        acc, _ = jax.lax.scan(hop, 0.0, idx_all)
        return acc

    def blk_gather(Vb, idx_all, q, scaled):
        def hop(acc, idx):
            cv = Vb[idx]                     # [B, E, M, D]
            d = jnp.einsum("bd,bemd->bem", q, cv.astype(jnp.float32),
                           precision=jax.lax.Precision.DEFAULT)
            if scaled:
                d = d * SC[idx]
            return acc + jnp.sum(d), None
        acc, _ = jax.lax.scan(hop, 0.0, idx_all)
        return acc

    bench("row f32  [B,EM] of [D]", row_gather, V32, idx_rows, q)
    bench("row bf16 [B,EM] of [D]", row_gather, V16, idx_rows, q)
    bench("row int8 [B,EM] of [D]", row_gather, V8, idx_rows, q)
    bench("blk f32  [B,E] of [M,D]", lambda v, i, qq: blk_gather(v, i, qq, False), I32f, idx_blk, q)
    bench("blk bf16 [B,E] of [M,D]", lambda v, i, qq: blk_gather(v, i, qq, False), I16, idx_blk, q)
    bench("blk int8 [B,E] of [M,D]", lambda v, i, qq: blk_gather(v, i, qq, False), I8, idx_blk, q)
    bench("blk int8+scale", lambda v, i, qq: blk_gather(v, i, qq, True), I8, idx_blk, q)

    # per-hop ancillary ops at current sizes: ids gather + topk merge
    NB = jnp.asarray(rng.integers(0, cap, (cap, M), dtype=np.int32))
    def ids_gather(idx_all):
        def hop(acc, idx):
            ids = NB[idx]                    # [B, E, M]
            return acc + jnp.sum(ids), None
        acc, _ = jax.lax.scan(hop, 0, idx_all)
        return acc
    bench("ids  [B,E] of [M] i32", ids_gather, idx_blk)

    P = 384
    pool = jnp.asarray(rng.random((B, P + E * M)).astype(np.float32))
    def topk_merge(pool_all):
        def hop(acc, _):
            negv, pos = jax.lax.top_k(-pool_all, P)
            return acc + jnp.sum(negv), None
        acc, _ = jax.lax.scan(hop, 0.0, jnp.arange(T))
        return acc
    bench(f"top_k P={P} of P+EM", topk_merge, pool)


if __name__ == "__main__":
    main()
