"""Round 2 ablation: vectorized dedup + expand grid on the real TPU."""
import time
import numpy as np


def main():
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu import Graph
    from hnsw_tpu.core.search import search_graph
    from hnsw_tpu.ops.topk import exact_topk

    n, d, k = 10_000, 128, 10
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = Graph(m=16, ef_search=20, metric="cosine", seed=0)
    t0 = time.perf_counter()
    g.build(list(range(n)), data, wave=2048)
    print(f"# build {time.perf_counter()-t0:.1f}s", flush=True)
    dev = g.device_graph()
    B = 1024
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    gt = np.asarray(exact_topk(q, dev.vectors, dev.sq_norms, dev.alive,
                               k=k, metric="cosine")[1])

    def run(tag, **kw):
        def f():
            dd, ii = search_graph(dev, q, k=k, metric="cosine",
                                  fast_math=True, **kw)
            jax.block_until_ready(ii)
            return ii
        ii = f()
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            ii = f()
        dt = (time.perf_counter() - t0) / reps
        ii = np.asarray(ii)
        hits = sum(len(set(map(int, ii[r])) & set(map(int, gt[r])))
                   for r in range(B))
        print(f"{tag:40s} {B/dt:8.0f} qps  recall={hits/(B*k):.4f}",
              flush=True)

    run("ef=192 E=8 H=40", ef=192, expand=8, max_hops=40)
    run("ef=192 E=4 H=80", ef=192, expand=4, max_hops=80)
    run("ef=192 E=2 H=160", ef=192, expand=2, max_hops=160)
    run("ef=192 E=16 H=24", ef=192, expand=16, max_hops=24)
    run("ef=256 E=8 H=48", ef=256, expand=8, max_hops=48)
    run("ef=256 E=4 H=96", ef=256, expand=4, max_hops=96)
    run("ef=384 E=8 H=64", ef=384, expand=8, max_hops=64)
    run("ef=384 E=16 H=40", ef=384, expand=16, max_hops=40)
    run("ef=384 E=32 H=24", ef=384, expand=32, max_hops=24)


if __name__ == "__main__":
    main()
