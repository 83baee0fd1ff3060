"""Disk-resident serving tier: MmapVectorStore + StreamingExactIndex +
Graph over mmap vectors.

Reference capability: parquet VectorStore serves queries from
disk-resident vectors with batched fetches (parquet/vector_ops.go:
18-63,321-432); quality oracle pattern from parquet/graph_test.go:179.
"""

import numpy as np
import pytest

from hnsw_tpu import Graph
from hnsw_tpu.index.streaming import StreamingExactIndex
from hnsw_tpu.io.mmap_store import MmapVectorStore
from hnsw_tpu.ops.topk import np_exact_topk
from tests.conftest import make_vectors


def test_mmap_store_roundtrip_and_growth(tmp_path):
    s = MmapVectorStore(str(tmp_path / "st"), dim=8, capacity=4)
    v = make_vectors(100, 8, seed=120)
    s.put_batch(np.arange(100), v)            # forces growth 4 -> 128
    assert s.capacity >= 100
    np.testing.assert_allclose(s.get(42), v[42])
    np.testing.assert_allclose(s.get_batch([3, 77]), v[[3, 77]])
    s.kill(42)
    s.flush()
    # reopen from disk
    s2 = MmapVectorStore(str(tmp_path / "st"))
    assert s2.dim == 8 and not s2.alive[42] and s2.alive[41]
    np.testing.assert_allclose(np.asarray(s2.vectors[:100]), v)


def test_streaming_exact_recall_one_with_tiny_chunks(tmp_path):
    # chunk_rows << N: device only ever holds a sliver of the dataset
    n, d, k = 5000, 16, 10
    v = make_vectors(n, d, seed=121)
    q = make_vectors(30, d, seed=122)
    idx = StreamingExactIndex(str(tmp_path / "sx"), metric="cosine",
                              chunk_rows=512)
    idx.batch_add(list(range(n)), v)
    keys, dists = idx.batch_search(q, k)
    gt_d, gt_i = np_exact_topk(q, v, k, "cosine")
    for i in range(len(q)):
        assert keys[i] == [int(x) for x in gt_i[i]]
    np.testing.assert_allclose(dists, gt_d, atol=1e-4)


def test_streaming_exact_delete_and_reopen(tmp_path):
    n, d = 300, 8
    v = make_vectors(n, d, seed=123)
    p = str(tmp_path / "sx")
    idx = StreamingExactIndex(p, chunk_rows=64)
    idx.batch_add(list(range(n)), v)
    assert idx.delete(5)
    res = idx.search(v[5], 1)
    assert res[0][0] != 5
    idx.close()
    # vectors survive on disk
    idx2 = StreamingExactIndex(p, chunk_rows=64)
    assert idx2.store.alive[6] and not idx2.store.alive[5]


def test_graph_over_mmap_store_quality_parity(tmp_path):
    # same data: Graph on RAM store vs Graph on disk store -> same
    # results (vectors identical, only residency differs)
    n, d, k = 400, 16, 5
    v = make_vectors(n, d, seed=124)
    q = make_vectors(20, d, seed=125)
    g_ram = Graph(seed=0)
    g_ram.batch_add(list(range(n)), v)
    g_dsk = Graph(seed=0, store=MmapVectorStore(str(tmp_path / "gv")))
    g_dsk.batch_add(list(range(n)), v)
    k1, d1 = g_ram.batch_search(q, k, ef=64)
    k2, d2 = g_dsk.batch_search(q, k, ef=64)
    assert [list(r) for r in k1] == [list(r) for r in k2]
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_disk_graph_vectors_on_disk(tmp_path):
    from hnsw_tpu.config import StoreConfig
    from hnsw_tpu.io.disk_graph import DiskGraph
    d = str(tmp_path / "dg")
    v = make_vectors(150, 8, seed=126)
    g = DiskGraph(d, store_config=StoreConfig(
        directory=d, format="npz", vectors_on_disk=True,
        wal_flush_interval_seconds=0))
    g.batch_add(list(range(150)), v)
    assert g.search(v[9], 1)[0][0] == 9
    g.close()
    g2 = DiskGraph(d, store_config=StoreConfig(
        directory=d, format="npz", vectors_on_disk=True,
        wal_flush_interval_seconds=0))
    assert len(g2) == 150
    assert g2.search(v[9], 1)[0][0] == 9


def test_disk_graph_hbm_mode_float16_passthrough(tmp_path):
    """StoreConfig.hbm_mode="float16" reaches the underlying Graph and
    survives reopen — the disk-backed fp16 capacity tier (clustered
    data that int8 misranks; half the HBM of f32 traversal)."""
    from hnsw_tpu.config import StoreConfig
    from hnsw_tpu.io.disk_graph import DiskGraph
    d = str(tmp_path / "dg16")

    def cfg():
        return StoreConfig(directory=d, format="npz",
                           vectors_on_disk=True, hbm_mode="float16",
                           wal_flush_interval_seconds=0)

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((5, 16)).astype(np.float32) * 5
    v = (centers[rng.integers(0, 5, 200)]
         + 0.1 * rng.standard_normal((200, 16)).astype(np.float32))
    g = DiskGraph(d, store_config=cfg())
    g.batch_add(list(range(200)), v)
    assert g.graph.hbm_mode == "float16"
    assert str(g.graph.device_graph().vectors.dtype) == "float16"
    assert g.search(v[9], 1)[0][0] == 9      # f32 host rerank: exact NN
    g.close()
    g2 = DiskGraph(d, store_config=cfg())
    assert g2.graph.hbm_mode == "float16"
    assert g2.search(v[9], 1)[0][0] == 9
    # the bool knob still works and hbm_mode="full" defers to it
    sc = StoreConfig(directory=d, format="npz", hbm_quantized=True,
                     wal_flush_interval_seconds=0)
    assert sc.hbm_mode == "full"
    with pytest.raises(ValueError):
        StoreConfig(directory=d, hbm_mode="int8").validate()


def test_hbm_quantized_mode_over_mmap_store(tmp_path):
    # capacity serving mode: HBM holds only the int8 traversal store;
    # raw vectors stay on disk, pool head reranked on host. Recall must
    # track the full-HBM path; reported distances are f32-exact.
    from hnsw_tpu.ops.distance import np_pairwise_dist
    n, d, k = 600, 32, 10
    v = make_vectors(n, d, seed=127)
    q = make_vectors(40, d, seed=128)
    g = Graph(seed=0, store=MmapVectorStore(str(tmp_path / "qv")))
    g.batch_add(list(range(n)), v)
    keys_full, _ = g.batch_search(q, k, ef=80)
    g.hbm_mode = "quantized"
    dev = g.device_graph()
    assert dev.vectors.shape[0] == 1      # placeholder only
    assert dev.qvec is not None
    keys_q, dists_q = g.batch_search(q, k, ef=80)
    _, gt = np_exact_topk(q, v, k, "cosine")

    def rec(keys):
        hits = sum(len(set(keys[i]) & set(map(int, gt[i])))
                   for i in range(len(keys)))
        return hits / (len(keys) * k)

    assert rec(keys_q) >= rec(keys_full) - 0.02, (rec(keys_q),
                                                  rec(keys_full))
    for i in range(5):
        for kk, dd in zip(keys_q[i], dists_q[i]):
            if kk is None:
                continue
            true_d = np_pairwise_dist(q[i][None], v[kk][None])[0, 0]
            assert abs(dd - true_d) < 1e-4
    # delete works in capacity mode too
    g.delete(keys_q[0][0])
    keys_after, _ = g.batch_search(q[:1], k)
    assert keys_q[0][0] not in keys_after[0]

def test_streaming_exact_hbm_chunk_cache(tmp_path):
    """HBM chunk cache: full chunks pin on device within the budget,
    repeat searches reuse them, and mutations invalidate the owning
    chunk (correctness oracle: results stay exact after an update)."""
    n, d, k = 2000, 16, 5
    v = make_vectors(n, d, seed=124)
    q = make_vectors(16, d, seed=125)
    idx = StreamingExactIndex(str(tmp_path / "sx"), metric="cosine",
                              chunk_rows=512,
                              hbm_cache_bytes=10 << 20)
    idx.batch_add(list(range(n)), v)
    keys, _ = idx.batch_search(q, k)
    assert len(idx._cache) == 3          # 3 full chunks; tail not pinned
    keys2, _ = idx.batch_search(q, k)    # served from the cache
    assert keys2 == keys
    _, gt_i = np_exact_topk(q, v, k, "cosine")
    for i in range(len(q)):
        assert keys[i] == [int(x) for x in gt_i[i]]

    # mutate a vector inside a cached chunk: cache entry drops and the
    # next search reflects the new value
    target = int(gt_i[0][0])
    idx.batch_add([target], -v[target][None])   # push it far away
    assert len(idx._cache) == 2
    keys3, _ = idx.batch_search(q, k)
    assert keys3[0][0] != target

    # zero budget -> nothing pins, results identical
    idx0 = StreamingExactIndex(str(tmp_path / "sx0"), metric="cosine",
                               chunk_rows=512, hbm_cache_bytes=0)
    idx0.batch_add(list(range(n)), v)
    k0, _ = idx0.batch_search(q, k)
    assert not idx0._cache
    for i in range(len(q)):
        assert k0[i] == [int(x) for x in gt_i[i]]


@pytest.mark.parametrize("dt", ["bf16", "fp16", "int8"])
def test_streaming_reduced_dtype_matches_oracle(tmp_path, dt):
    """stream_dtype casts chunks on host before upload (2-4x less H2D
    on the link-bound cold path); the f32 host rerank against the mmap
    store restores exact ordering — the ExactIndex capacity contract
    over disk-resident vectors."""
    n, d, k = 3000, 16, 10
    v = make_vectors(n, d, seed=130)
    q = make_vectors(24, d, seed=131)
    idx = StreamingExactIndex(str(tmp_path / f"sx_{dt}"),
                              metric="cosine", chunk_rows=512,
                              stream_dtype=dt)
    idx.batch_add(list(range(n)), v)
    keys, dists = idx.batch_search(q, k)
    gt_d, gt_i = np_exact_topk(q, v, k, "cosine")
    rec = np.mean([len(set(keys[r]) & set(map(int, gt_i[r]))) / k
                   for r in range(len(q))])
    floor = 0.95 if dt == "int8" else 0.99
    assert rec >= floor, f"{dt} recall {rec}"
    # distances of shared keys are f32-exact (host rerank)
    for r in range(6):
        gmap = {int(i): float(dd) for i, dd in zip(gt_i[r], gt_d[r])}
        for kk_, dd in zip(keys[r], dists[r]):
            if kk_ in gmap:
                np.testing.assert_allclose(dd, gmap[kk_], rtol=1e-4)
    # delete stays correct through the reduced path
    victim = keys[0][0]
    idx.delete(victim)
    keys2, _ = idx.batch_search(q[:1], k)
    assert victim not in keys2[0]


def test_streaming_reduced_cache_and_mode_switch(tmp_path):
    """Reduced chunks pin at reduced size (the budget stretches over
    2-4x the working set) and switching stream_dtype drops stale
    pins."""
    n, d, k = 2000, 16, 5
    v = make_vectors(n, d, seed=132)
    q = make_vectors(8, d, seed=133)
    idx = StreamingExactIndex(str(tmp_path / "sxc"), metric="cosine",
                              chunk_rows=512, hbm_cache_bytes=10 << 20,
                              stream_dtype="int8")
    idx.batch_add(list(range(n)), v)
    k1, _ = idx.batch_search(q, k)
    assert len(idx._cache) == 3
    int8_bytes = idx._cache_bytes
    # int8 chunk ~= dim + scales + sq + alive bytes/row, ~1/4 of f32
    assert int8_bytes < 512 * 3 * (d * 4 + 9)
    k2, _ = idx.batch_search(q, k)
    assert k2 == k1
    idx.stream_dtype = "float32"          # mode switch drops the pins
    k3, _ = idx.batch_search(q, k)
    assert idx._cache_stream_dtype == "float32"
    gt_d, gt_i = np_exact_topk(q, v, k, "cosine")
    for i in range(len(q)):
        assert k3[i] == [int(x) for x in gt_i[i]]
