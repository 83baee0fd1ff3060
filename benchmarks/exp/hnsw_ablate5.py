"""Focused grid around the new sweet spots (narrow expansion wins now)."""
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
    g.build(list(range(n)), data, wave=2048)
    dev = g.device_graph()
    B = 1024
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    gt = np.asarray(exact_topk(q, dev.vectors, dev.sq_norms, dev.alive,
                               k=k, metric="cosine")[1])

    def run(tag, B_use=B, **kw):
        qq = q[:B_use]
        def f():
            dd, ii = search_graph(dev, qq, k=k, metric="cosine",
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
                   for r in range(B_use))
        print(f"{tag:40s} {B_use/dt:8.0f} qps  recall={hits/(B_use*k):.4f}",
              flush=True)

    run("ef=192 E=1 H=320", ef=192, expand=1, max_hops=320)
    run("ef=192 E=2 H=160", ef=192, expand=2, max_hops=160)
    run("ef=224 E=2 H=192", ef=224, expand=2, max_hops=192)
    run("ef=256 E=2 H=224", ef=256, expand=2, max_hops=224)
    run("ef=256 E=2 H=160", ef=256, expand=2, max_hops=160)
    run("ef=320 E=2 H=256", ef=320, expand=2, max_hops=256)
    run("ef=384 E=2 H=320", ef=384, expand=2, max_hops=320)
    run("ef=384 E=4 H=160", ef=384, expand=4, max_hops=160)
    # batch scaling at the 0.98 point
    run("ef=256 E=2 H=224 B=4096", B_use=1024, ef=256, expand=2,
        max_hops=224)


if __name__ == "__main__":
    main()
