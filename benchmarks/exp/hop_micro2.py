"""Dissect the real beam_search_layer body: which component eats the hop?

Runs the layer-0 beam on the REAL 10k graph with components toggled.
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
    from hnsw_tpu.ops.topk import topk_smallest

    n, d = 10_000, 128
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data, wave=2048)
    print(f"# build {time.perf_counter()-t0:.1f}s", flush=True)
    dev = g.device_graph()
    B, P, E, M = 1024, 192, 8, dev.m
    cap = dev.cap
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    q_sq = jnp.sum(q * q, axis=-1)

    @functools.partial(jax.jit, static_argnames=(
        "hops", "use_visited", "use_alive", "use_sel", "use_score",
        "use_merge"))
    def beam(gv, queries, q_sq, *, hops, use_visited=True, use_alive=True,
             use_sel=True, use_score=True, use_merge=True):
        neigh = gv.neighbors[0]
        rows = jnp.arange(B)
        start = jnp.broadcast_to(gv.entry, (B,)).astype(jnp.int32)
        pool_i = jnp.full((B, P), -1, jnp.int32).at[:, 0].set(start)
        pool_d = jnp.full((B, P), INF_DIST, jnp.float32).at[:, 0].set(0.5)
        expanded = pool_i < -1
        visited = jnp.zeros((B, cap), bool).at[rows, start].set(True)

        def body(state, _):
            pool_d, pool_i, expanded, visited = state
            if use_sel:
                sel_d = jnp.where(expanded | (pool_i < 0), INF_DIST, pool_d)
                negv, j = jax.lax.top_k(-sel_d, E)
                take = (-negv) < jnp.max(pool_d, axis=1)[:, None]
            else:
                j = jnp.broadcast_to(jnp.arange(E)[None], (B, E))
                take = jnp.ones((B, E), bool)
            cur = pool_i[rows[:, None], j]
            cur_safe = jnp.clip(jnp.where(take, cur, 0), 0, cap - 1)
            expanded = expanded.at[rows[:, None], j].max(take)
            nbrs = neigh[cur_safe].reshape(B, E * M)
            nb_ok = (nbrs >= 0) & jnp.repeat(take, M, axis=1)
            nb_safe = jnp.clip(jnp.where(nb_ok, nbrs, 0), 0, cap - 1)
            if use_visited:
                seen = visited[rows[:, None], nb_safe]
                eval_mask = nb_ok & (~seen)
                visited = visited.at[rows[:, None], nb_safe].max(nb_ok)
            else:
                eval_mask = nb_ok
            if use_alive:
                eval_mask = eval_mask & gv.alive[nb_safe]
            if use_score:
                cv = gv.vectors[nb_safe]
                cs = gv.sq_norms[nb_safe]
                dd = gathered_dist(queries, cv, cs, q_sq, metric="cosine",
                                   precision=jax.lax.Precision.DEFAULT)
                dd = jnp.where(eval_mask, dd, INF_DIST)
            else:
                dd = jnp.where(eval_mask, 0.4, INF_DIST)
            new_i = jnp.where(eval_mask, nbrs, -1)
            if use_merge:
                md = jnp.concatenate([pool_d, dd], axis=1)
                mi = jnp.concatenate([pool_i, new_i], axis=1)
                me = jnp.concatenate(
                    [expanded, jnp.zeros((B, E * M), bool)], axis=1)
                pd, pos = topk_smallest(md, P)
                pool_i = jnp.take_along_axis(mi, pos, axis=1)
                expanded = jnp.take_along_axis(me, pos, axis=1)
                pool_d = pd
            else:
                pool_d = pool_d + jnp.sum(dd, axis=1, keepdims=True) * 0
            return (pool_d, pool_i, expanded, visited), None

        state = (pool_d, pool_i, expanded, visited)
        state, _ = jax.lax.scan(body, state, None, length=hops)
        return state[0], state[1]

    def bench(tag, **kw):
        f = lambda: jax.block_until_ready(beam(dev, q, q_sq, **kw))
        f()
        t0 = time.perf_counter()
        for _ in range(3):
            f()
        dt = (time.perf_counter() - t0) / 3
        hops = kw["hops"]
        print(f"{tag:42s} {dt*1e3/hops:8.3f} ms/hop  ({dt*1e3:.0f} ms total)",
              flush=True)

    bench("full body H=32", hops=32)
    bench("full body H=64", hops=64)
    bench("no visited", hops=32, use_visited=False)
    bench("no alive-gather", hops=32, use_alive=False)
    bench("no top_k select (fixed j)", hops=32, use_sel=False)
    bench("no score (const dists)", hops=32, use_score=False)
    bench("no pool merge", hops=32, use_merge=False)
    bench("score+gather only", hops=32, use_visited=False,
          use_alive=False, use_sel=False, use_merge=False)


if __name__ == "__main__":
    main()
