"""1M exact-tier serving: f32 oracle vs bf16 fast_math vs Pallas fused."""
import time
import numpy as np


def main():
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax
    import jax.numpy as jnp
    from hnsw_tpu.ops.topk import exact_topk
    from hnsw_tpu.ops.pallas_exact import exact_topk_fused

    n, d, k = 1_000_000, 128, 10
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.sum(data.astype(np.float64) * data, axis=1).astype(np.float32)
    v = jnp.asarray(data)
    s = jnp.asarray(sq)
    alive = jnp.ones((n,), bool)
    B = 8192
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

    def bench(tag, fn):
        dd, ii = fn()
        jax.block_until_ready(ii)
        t0 = time.perf_counter()
        for _ in range(3):
            dd, ii = fn()
        jax.block_until_ready(ii)
        dt = (time.perf_counter() - t0) / 3
        print(f"{tag:34s} {B/dt:9.0f} qps", flush=True)
        return np.asarray(ii)

    gt = bench("xla f32 HIGHEST (oracle)",
               lambda: exact_topk(q, v, s, alive, k=k, metric="cosine"))
    for tag, fn in (
        ("xla bf16 fast_math + f32 rerank",
         lambda: exact_topk(q, v, s, alive, k=k, metric="cosine",
                            fast_math=True)),
        ("pallas fused f32",
         lambda: exact_topk_fused(q, v, s, alive, k=k, metric="cosine")),
        ("pallas fused bf16",
         lambda: exact_topk_fused(q, v, s, alive, k=k, metric="cosine",
                                  fast_math=True)),
    ):
        ii = bench(tag, fn)
        rec = np.mean([len(set(ii[r]) & set(gt[r])) / k for r in range(B)])
        print(f"    recall vs f32 oracle: {rec:.5f}", flush=True)


if __name__ == "__main__":
    main()
