"""Dissect the CURRENT beam body at the serving operating point.

quant_hop measured B-scaling flat (hop throughput-bound at B=1024) and
int8 gathers SLOWER than f32 (XLA gathers are row-bound, not
byte-bound). This isolates which component scales: gather+score,
the fused sort merge, or select/dedup — at E=2, fast_math, the real
graph, B in {1024, 8192}.
"""
import functools
import time
import numpy as np


def main():
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu import Graph
    from hnsw_tpu.ops.distance import INF_DIST, gathered_dist

    n, d = 10_000, 128
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data)
    print(f"# build {time.perf_counter()-t0:.1f}s", flush=True)
    dev = g.device_graph()
    E, M = 2, dev.m
    cap = dev.cap
    P = 192

    @functools.partial(jax.jit, static_argnames=(
        "hops", "B", "use_sel", "use_score", "use_merge", "use_inpool"))
    def beam(gv, queries, q_sq, *, hops, B, use_sel=True, use_score=True,
             use_merge=True, use_inpool=True):
        neigh = gv.neighbors[0]
        rows = jnp.arange(B)
        start = jnp.broadcast_to(gv.entry, (B,)).astype(jnp.int32)
        pool_i = jnp.full((B, P), -1, jnp.int32).at[:, 0].set(start)
        pool_d = jnp.full((B, P), INF_DIST, jnp.float32).at[:, 0].set(0.5)
        expanded = pool_i < -1

        def body(state, _):
            pool_d, pool_i, expanded = state
            if use_sel:
                sel_d = jnp.where(expanded | (pool_i < 0), INF_DIST,
                                  pool_d)
                negv, j = jax.lax.top_k(-sel_d, E)
                take = (-negv) < jnp.max(pool_d, axis=1)[:, None]
            else:
                j = jnp.broadcast_to(jnp.arange(E)[None], (B, E))
                take = jnp.ones((B, E), bool)
            cur = jnp.take_along_axis(pool_i, j, axis=1)
            cur_safe = jnp.clip(jnp.where(take, cur, 0), 0, cap - 1)
            expanded = expanded.at[rows[:, None], j].max(take)
            nbrs = neigh[cur_safe].reshape(B, E * M)
            nb_ok = (nbrs >= 0) & jnp.repeat(take, M, axis=1)
            if use_inpool:
                in_pool = (nbrs[:, :, None] == pool_i[:, None, :]).any(-1)
                nb_ok = nb_ok & (~in_pool)
            nb_safe = jnp.clip(jnp.where(nb_ok, nbrs, 0), 0, cap - 1)
            if use_score:
                cv = gv.vectors[nb_safe]
                cs = gv.sq_norms[nb_safe]
                dd = gathered_dist(queries, cv, cs, q_sq, metric="cosine",
                                   precision=jax.lax.Precision.DEFAULT)
                dd = jnp.where(nb_ok, dd, INF_DIST)
            else:
                dd = jnp.where(nb_ok, 0.4, INF_DIST)
            new_i = jnp.where(nb_ok, nbrs, -1)
            if use_merge:
                md = jnp.concatenate([pool_d, dd], axis=1)
                mi = jnp.concatenate([pool_i, new_i], axis=1)
                me = jnp.concatenate(
                    [expanded, jnp.zeros((B, E * M), bool)], axis=1)
                sd, si, se = jax.lax.sort((md, mi, me), dimension=1,
                                          num_keys=1, is_stable=True)
                pool_d, pool_i, expanded = sd[:, :P], si[:, :P], se[:, :P]
            else:
                pool_d = pool_d + jnp.sum(dd, axis=1, keepdims=True) * 0
            return (pool_d, pool_i, expanded), None

        state, _ = jax.lax.scan(body, (pool_d, pool_i, expanded), None,
                                length=hops)
        return state[0], state[1]

    for B in (1024, 8192):
        q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
        q_sq = jnp.sum(q * q, axis=-1)

        def bench(tag, **kw):
            f = lambda: jax.block_until_ready(
                beam(dev, q, q_sq, B=B, **kw))
            f()
            t0 = time.perf_counter()
            for _ in range(3):
                f()
            dt = (time.perf_counter() - t0) / 3
            hops = kw["hops"]
            print(f"B={B} {tag:34s} {dt*1e3/hops:8.3f} ms/hop "
                  f"({dt*1e3:.0f} ms total)", flush=True)

        bench("full body H=64", hops=64)
        bench("no top_k select", hops=64, use_sel=False)
        bench("no in-pool mask", hops=64, use_inpool=False)
        bench("no score (const dists)", hops=64, use_score=False)
        bench("no sort merge", hops=64, use_merge=False)
        bench("gather+score only", hops=64, use_sel=False,
              use_inpool=False, use_merge=False)


if __name__ == "__main__":
    main()
