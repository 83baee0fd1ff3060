"""Block-gather vs row-gather microbenchmark.

hop_micro3: the hop's dominant term is the per-candidate vector gather
(B*E*M rows of 512 B — ~50 GB/s effective, row-granularity-bound).
Hypothesis: gathering B*E contiguous [M, D] neighbor blocks (4 KB int8 /
16 KB f32 each) reaches streaming bandwidth — ~10x on this term.
"""
import functools
import time
import numpy as np


def main():
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp

    cap, M, D = 131072, 32, 128
    rng = np.random.default_rng(0)
    vec_f32 = jnp.asarray(rng.standard_normal((cap, D)).astype(np.float32))
    vec_i8 = jnp.asarray(
        np.clip(np.rint(np.asarray(vec_f32) * 64), -127, 127).astype(np.int8))
    blk_i8 = jnp.asarray(np.asarray(vec_i8)[
        rng.integers(0, cap, (cap, M))])            # [cap, M, D] int8
    blk_f32 = blk_i8.astype(jnp.float32)

    for B, E in ((1024, 2), (8192, 2), (8192, 8)):
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        ids_rows = jnp.asarray(
            rng.integers(0, cap, (B, E * M)).astype(np.int32))
        ids_blk = jnp.asarray(rng.integers(0, cap, (B, E)).astype(np.int32))

        # tables passed as ARGUMENTS: closed-over device arrays get
        # embedded in the remote-compile payload (HTTP 413 at 537 MB)
        @jax.jit
        def row_f32(tbl, qq, ids):
            cv = tbl[ids]                            # [B, E*M, D]
            return jnp.einsum("bd,bcd->bc", qq, cv,
                              precision=jax.lax.Precision.DEFAULT)

        @jax.jit
        def row_i8(tbl, qq, ids):
            cv = tbl[ids]
            return jnp.einsum("bd,bcd->bc", qq.astype(jnp.bfloat16),
                              cv.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        @jax.jit
        def block_i8(tbl, qq, ids):
            blk = tbl[ids]                           # [B, E, M, D]
            qv = jnp.einsum("bd,bemd->bem", qq.astype(jnp.bfloat16),
                            blk.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return qv.reshape(qq.shape[0], -1)

        @jax.jit
        def block_f32(tbl, qq, ids):
            blk = tbl[ids]
            qv = jnp.einsum("bd,bemd->bem", qq, blk,
                            precision=jax.lax.Precision.DEFAULT)
            return qv.reshape(qq.shape[0], -1)

        for tag, f, tbl, ids in (("row f32", row_f32, vec_f32, ids_rows),
                                 ("row int8", row_i8, vec_i8, ids_rows),
                                 ("block int8", block_i8, blk_i8, ids_blk),
                                 ("block f32", block_f32, blk_f32,
                                  ids_blk)):
            fn = lambda i: f(tbl, q, i)
            out = fn(ids)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(ids)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 10
            rows = B * E * M
            print(f"B={B} E={E} {tag:11s} {dt*1e3:8.3f} ms "
                  f"({rows/dt/1e6:.0f}M cand-rows/s)", flush=True)


if __name__ == "__main__":
    main()
