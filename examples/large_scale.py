"""Large-scale serving on TPU: the strategy crossovers.

On the MXU, brute-force exact scan IS the fast path far beyond where
CPU libraries switch to graphs (measured on one v5e chip, 128-d
cosine, batch 1024-8192):

    N = 10k    exact ~226k qps (fast 270k @ .997)   recall 1.0
    N = 100k   exact ~39k-130k qps                  recall 1.0
    N = 1M     exact 17k qps; fast 197k @ .9991
    N = 2M     exact 8k qps;  fast 118k @ .9994     (one chip)

The reference's Go engine serves 10k at ~0.4k qps (recall .98). The
hybrid index therefore keeps datasets in the exact tier far longer on
TPU, moves to IVF partition scans for very large clustered corpora,
and uses the HNSW graph (block layout + pivot entry, auto fp16 blocks
on tight clusters) for incremental/delete-heavy workloads and
multi-chip partitioned serving. Single-chip device builds scale to 2M
vectors (~49 min).

Run: python examples/large_scale.py          (real TPU; ~5 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize force-registers the TPU backend; the env
    # var alone is not honored (see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    from hnsw_tpu.utils.warmup import warmup_transfers
    warmup_transfers()
    import jax.numpy as jnp

    from hnsw_tpu import ExactIndex, HybridConfig, HybridIndex, IVFIndex

    rng = np.random.default_rng(0)
    n, d = 200_000, 128
    print(f"dataset: {n} x {d} (clustered)")
    centers = rng.standard_normal((200, d)).astype(np.float32) * 4
    asg = rng.integers(0, 200, n)
    data = (centers[asg]
            + 0.5 * rng.standard_normal((n, d)).astype(np.float32))
    queries = (centers[rng.integers(0, 200, 1024)]
               + 0.5 * rng.standard_normal((1024, d)).astype(np.float32))

    # exact tier (auto-fused pallas kernel at this size)
    ex = ExactIndex(metric="cosine")
    ex.batch_add(np.arange(n), data)
    ex.batch_search(queries, 10)  # warm
    t0 = time.perf_counter()
    gt_keys, _ = ex.batch_search(queries, 10)
    dt = time.perf_counter() - t0
    print(f"exact:  {1024 / dt:.0f} qps (recall 1.0 by definition)")

    # IVF partition scans (clustered data is its home turf)
    ivf = IVFIndex(num_partitions=256, nprobe=16, kmeans_iters=6)
    t0 = time.perf_counter()
    ivf.build(list(range(n)), data)
    print(f"ivf build: {time.perf_counter() - t0:.0f}s")
    ivf.batch_search(queries, 10)  # warm
    t0 = time.perf_counter()
    keys, _ = ivf.batch_search(queries, 10)
    dt = time.perf_counter() - t0
    hits = sum(len({x for x in keys[i] if x is not None} &
                   {int(x) for x in gt_keys[i]}) for i in range(1024))
    print(f"ivf:    {1024 / dt:.0f} qps recall@10={hits / 10240:.3f}")

    # capacity mode: reduced-precision HBM table + f32 host rerank.
    # "auto" walks the fidelity ladder (int8 -> bf16 -> fp16 -> f32)
    # against THIS data, so tight clusters never silently degrade —
    # one chip serves 21M rows bf16 (12.2k qps @ .9999) or 33M int8
    # (6.9k qps @ .99999); this demo just shows the knob.
    cap = ExactIndex(metric="cosine", hbm_dtype="auto")
    cap.batch_add(np.arange(n), data)
    cap.batch_search(queries, 10)  # warm + resolve the rung
    t0 = time.perf_counter()
    keys, _ = cap.batch_search(queries, 10)
    dt = time.perf_counter() - t0
    hits = sum(len({x for x in keys[i] if x is not None} &
                   {int(x) for x in gt_keys[i]}) for i in range(1024))
    print(f"capacity[{cap._resolved_hbm}]: {1024 / dt:.0f} qps "
          f"recall@10={hits / 10240:.3f}")

    # very long device builds are restartable: Graph.build(...,
    # checkpoint_path="ckpt.npz") snapshots every 128 waves and
    # Graph.resume_build("ckpt.npz") picks up after a crash/kill.


if __name__ == "__main__":
    main()
