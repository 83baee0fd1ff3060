"""Split the block hop's gather+score cost: DMA vs VPU (ROADMAP 1).

hop_micro4 showed gather+score ~0.69 ms/hop at B=1024, E=2, M=32,
D=128 (8.4 MB of int8 blocks) — ~12 GB/s effective, 1.5% of HBM peak.
Is that the GATHER (random 4 KB reads) or the SCORE (int8->bf16 cast +
einsum lowering)? Variants, 64 fixed iterations each:

  gather_sum     blocks[cur] then sum-reduce (pure gather + trivial VPU)
  gather_sum8    same but gathering [cap, M, D] uint8 view reduced to
                 int32 (no bf16 cast)
  einsum_fixed   einsum on a RESIDENT [B, E, M, D] block (no gather)
  gather_einsum  the real thing (gather + cast + einsum + epilogue)
  rowgather_sum  plain row gather [B, E*M] from [cap, D] (the pre-block
                 layout) for a row-granularity baseline
  gather_f16     fp16 blocks gather + f32 einsum (the tight-cluster
                 path: 2x bytes, same row count)

Prints ms/iter per variant at cap=131072.
"""
import functools
import os
import time

import numpy as np

SMALL = bool(os.environ.get("HOP_MICRO5_SMALL"))


def main():
    if SMALL:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp

    cap = 4096 if SMALL else 131072
    B = 64 if SMALL else 1024
    E, M, d = 2, 32, 128
    iters = 8 if SMALL else 64
    rng = np.random.default_rng(0)
    blocks8 = jnp.asarray(
        rng.integers(-127, 128, (cap, M, d)).astype(np.int8))
    blocks16 = jnp.asarray(
        rng.standard_normal((cap, M, d)).astype(np.float16))
    rows = jnp.asarray(rng.standard_normal((cap, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    q_sq = jnp.sum(q * q, axis=-1)
    # fresh random ids per iteration, precomputed outside the timer
    curs = jnp.asarray(rng.integers(0, cap, (iters, B, E)).astype(np.int32))
    scale = jnp.float32(1 / 64)

    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(curs, q, q_sq, blocks8, blocks16, rows, variant: str):
        def body(acc, cur):
            if variant == "gather_sum":
                blk = blocks8[cur]                     # [B, E, M, D] int8
                r = jnp.sum(blk.astype(jnp.int32), axis=(1, 2, 3))
                return acc + r.astype(jnp.float32), None
            if variant == "einsum_fixed":
                blk = blocks8[jnp.zeros_like(cur)]     # resident-ish
                qv = jnp.einsum("bd,bemd->bem", q.astype(jnp.bfloat16),
                                blk.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                return acc + jnp.sum(qv.reshape(B, -1), axis=1), None
            if variant == "gather_einsum":
                blk = blocks8[cur]
                qv = jnp.einsum("bd,bemd->bem", q.astype(jnp.bfloat16),
                                blk.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                qv = qv.reshape(B, E * M) * scale
                dd = 1.0 - qv * jax.lax.rsqrt(q_sq[:, None] + 1e-30)
                return acc + jnp.sum(dd, axis=1), None
            if variant == "gather_f16":
                blk = blocks16[cur].astype(jnp.float32)
                qv = jnp.einsum("bd,bemd->bem", q, blk,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                return acc + jnp.sum(qv.reshape(B, -1), axis=1), None
            if variant == "rowgather_sum":
                ids = (cur[:, 0:1] * 37 + jnp.arange(E * M)[None] * 101
                       ) % cap                         # [B, E*M] pseudo
                rv = rows[ids]                         # [B, E*M, D] f32
                return acc + jnp.sum(rv, axis=(1, 2)), None
            raise ValueError(variant)

        acc, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), curs)
        return acc

    for variant in ("gather_sum", "einsum_fixed", "gather_einsum",
                    "gather_f16", "rowgather_sum"):
        f = lambda: jax.block_until_ready(
            run(curs, q, q_sq, blocks8, blocks16, rows, variant))
        f()
        t0 = time.perf_counter()
        for _ in range(3):
            f()
        dt = (time.perf_counter() - t0) / 3
        print(f"cap={cap} {variant:14s} {dt*1e3/iters:8.3f} ms/iter "
              f"({dt*1e3:.0f} ms/{iters})", flush=True)


if __name__ == "__main__":
    main()
