"""Dissect the POST-redesign serving hop (ROADMAP item 1: measure
whether the block gather dominates before attempting a Pallas
double-buffered DMA hop).

Mirrors core/search.beam_search_layer's current serving config — int8
neighbor-BLOCK layout, E=2 expansion, bitonic merge, candidate tri
dedup — over SYNTHETIC graph state (random neighbor ids): gather cost
is a function of table size and access pattern, not edge quality, so no
build is needed. Ablates, at B=1024, cap in {16384, 131072}:

  full            the whole body (block gather + score + bitonic merge)
  no_gather       const dists (removes the [B,E,M,D] int8 block gather
                  AND its einsum)
  gather_only     block gather + einsum, pool ops removed
  sort_merge      full body but lax.sort merge instead of bitonic
  no_inpool       full minus the [B,C,P] in-pool broadcast mask
  no_tridedup     full minus the [B,C,C] candidate self-dedup

Prints ms/hop per variant.
"""
import functools
import os
import time

import numpy as np

SMALL = bool(os.environ.get("HOP_MICRO4_SMALL"))


def main():
    if SMALL:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.core.search import _bitonic_merge, _dedup_adjacent
    from hnsw_tpu.ops.distance import INF_DIST

    d = 128
    E = 2
    M = 32          # layer-0 degree at m=16
    P = 192
    _EXP_BIT = np.int32(1 << 30)
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=(
        "hops", "B", "use_gather", "use_pool", "merge",
        "use_inpool", "use_tridedup"))
    def beam(neigh, blocks, scale, queries, q_sq, *, hops, B,
             use_gather=True, use_pool=True, merge="bitonic",
             use_inpool=True, use_tridedup=True):
        cap = neigh.shape[0]
        rows = jnp.arange(B)
        start = jnp.zeros((B,), jnp.int32)
        pool_i = jnp.full((B, P), -1, jnp.int32).at[:, 0].set(start)
        pool_d = jnp.full((B, P), INF_DIST, jnp.float32).at[:, 0].set(0.5)
        expanded = pool_i < -1

        def body(state, _):
            pool_d, pool_i, expanded = state
            sel_d = jnp.where(expanded | (pool_i < 0), INF_DIST, pool_d)
            negv, j = jax.lax.top_k(-sel_d, E)
            take = (-negv) < jnp.max(pool_d, axis=1)[:, None]
            cur = jnp.take_along_axis(pool_i, j, axis=1)
            cur_safe = jnp.clip(jnp.where(take, cur, 0), 0, cap - 1)
            expanded = expanded.at[rows[:, None], j].max(take)
            nbrs = neigh[cur_safe].reshape(B, E * M)
            nb_ok = (nbrs >= 0) & jnp.repeat(take, M, axis=1)
            if use_inpool:
                in_pool = (nbrs[:, :, None] == pool_i[:, None, :]).any(-1)
                nb_ok = nb_ok & (~in_pool)
            if use_gather:
                blk = blocks[cur_safe]                # [B, E, M, D] int8
                qv = jnp.einsum("bd,bemd->bem",
                                queries.astype(jnp.bfloat16),
                                blk.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                qv = qv.reshape(B, E * M) * scale
                bsq = jnp.sum(jnp.square(blk.astype(jnp.bfloat16)),
                              axis=-1).astype(jnp.float32)
                vsq = bsq.reshape(B, E * M) * jnp.square(scale)
                dd = 1.0 - qv * jax.lax.rsqrt(q_sq[:, None] * vsq + 1e-30)
                dd = jnp.where(nb_ok, dd, INF_DIST)
            else:
                dd = jnp.where(nb_ok, 0.4, INF_DIST)
            new_i = jnp.where(nb_ok, nbrs, -1)
            if not use_pool:
                pool_d = pool_d + jnp.sum(dd, axis=1, keepdims=True) * 0
                return (pool_d, pool_i, expanded), None
            ei = jnp.where(expanded & (pool_i >= 0), pool_i | _EXP_BIT,
                           pool_i)
            if merge == "bitonic":
                if use_tridedup:
                    C = new_i.shape[1]
                    tri = jnp.tril(jnp.ones((C, C), bool), k=-1)
                    is_dup = ((new_i[:, :, None] == new_i[:, None, :])
                              & (new_i[:, :, None] >= 0)
                              & tri[None]).any(-1)
                    dd = jnp.where(is_dup, INF_DIST, dd)
                    new_i = jnp.where(is_dup, -1, new_i)
                pool_d, packed = _bitonic_merge(pool_d, ei, dd, new_i, P)
                expanded = packed >= _EXP_BIT
                pool_i = jnp.where(packed >= 0, packed & (_EXP_BIT - 1),
                                   packed)
            else:
                md = jnp.concatenate([pool_d, dd], axis=1)
                mi = jnp.concatenate([ei, new_i], axis=1)
                sd, si = jax.lax.sort((md, mi), dimension=1, num_keys=1,
                                      is_stable=True)
                pool_d, packed = sd[:, :P], si[:, :P]
                expanded = packed >= _EXP_BIT
                pool_i = jnp.where(packed >= 0, packed & (_EXP_BIT - 1),
                                   packed)
                pool_d, pool_i, expanded = _dedup_adjacent(
                    pool_d, pool_i, expanded)
            return (pool_d, pool_i, expanded), None

        state, _ = jax.lax.scan(body, (pool_d, pool_i, expanded), None,
                                length=hops)
        return state[0], state[1]

    caps = (2048,) if SMALL else (16384, 131072)
    for cap in caps:
        neigh = jnp.asarray(
            rng.integers(0, cap, (cap, M)).astype(np.int32))
        qv8 = rng.integers(-127, 128, (cap, d)).astype(np.int8)
        blocks = jnp.asarray(qv8[np.asarray(neigh)])   # [cap, M, D] int8
        scale = jnp.float32(1.0 / 64.0)
        B = 64 if SMALL else 1024
        q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
        q_sq = jnp.sum(q * q, axis=-1)

        def bench(tag, **kw):
            f = lambda: jax.block_until_ready(
                beam(neigh, blocks, scale, q, q_sq, B=B, hops=64, **kw))
            f()
            t0 = time.perf_counter()
            for _ in range(3):
                f()
            dt = (time.perf_counter() - t0) / 3
            print(f"cap={cap} {tag:18s} {dt*1e3/64:8.3f} ms/hop "
                  f"({dt*1e3:.0f} ms/64 hops)", flush=True)

        bench("full")
        bench("no_gather", use_gather=False)
        bench("gather_only", use_pool=False, use_inpool=False)
        bench("sort_merge", merge="sort")
        bench("no_inpool", use_inpool=False)
        bench("no_tridedup", use_tridedup=False)


if __name__ == "__main__":
    main()
