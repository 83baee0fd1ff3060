"""IVF index tests — recall vs exact oracle, probe behavior, mutation."""

import numpy as np
import pytest

from hnsw_tpu.index.ivf import IVFIndex
from hnsw_tpu.ops.topk import np_exact_topk
from hnsw_tpu.utils.surface import (BasicSurface, ContraMap, VectorDistance,
                                    node_surface)
from tests.conftest import make_vectors


def _recall(keys, gt, k):
    hits = sum(len({int(x) for x in keys[i] if x is not None} &
                   set(map(int, gt[i]))) for i in range(len(gt)))
    return hits / (len(gt) * k)


def test_ivf_recall_close_to_exact():
    n, d, k = 2000, 32, 10
    v = make_vectors(n, d, seed=90)
    q = make_vectors(50, d, seed=91)
    idx = IVFIndex(num_partitions=16, nprobe=8, kmeans_iters=5)
    idx.build(list(range(n)), v)
    _, gt = np_exact_topk(q, v, k, "cosine")
    keys, dists = idx.batch_search(q, k)
    r = _recall(keys, gt, k)
    assert r >= 0.85, r
    # distances ascend
    assert all(np.all(np.diff(row) >= -1e-6) for row in dists)


def test_ivf_full_probe_equals_exact():
    n, d, k = 500, 16, 5
    v = make_vectors(n, d, seed=92)
    q = make_vectors(20, d, seed=93)
    idx = IVFIndex(num_partitions=8, nprobe=8, kmeans_iters=3)
    idx.build(list(range(n)), v)
    _, gt = np_exact_topk(q, v, k, "cosine")
    keys, _ = idx.batch_search(q, k)
    assert _recall(keys, gt, k) == 1.0  # probing all partitions == exact


def test_ivf_mutation():
    v = make_vectors(300, 16, seed=94)
    idx = IVFIndex(num_partitions=8, nprobe=4, kmeans_iters=3)
    idx.build(list(range(200)), v[:200])
    idx.batch_add(list(range(200, 300)), v[200:])
    assert len(idx) == 300
    assert idx.search(v[250], 1)[0][0] == 250
    assert idx.delete(250)
    assert idx.search(v[250], 1)[0][0] != 250
    assert not idx.delete(250)
    s = idx.stats()
    assert s["total"] == 299


def test_ivf_nprobe_validation():
    with pytest.raises(ValueError, match="nprobe"):
        IVFIndex(num_partitions=4, nprobe=8)


def test_ivf_l2_metric():
    v = make_vectors(400, 16, seed=95)
    q = make_vectors(10, 16, seed=96)
    idx = IVFIndex(num_partitions=8, nprobe=6, metric="l2", kmeans_iters=3)
    idx.build(list(range(400)), v)
    _, gt = np_exact_topk(q, v, 5, "l2")
    keys, _ = idx.batch_search(q, 5)
    assert _recall(keys, gt, 5) >= 0.85


# -------------------------------------------------------- surfaces (parity)

def test_surface_contramap():
    s = BasicSurface("l2")
    assert abs(s.distance([0, 0], [3, 4]) - 5.0) < 1e-5
    cm = ContraMap(s, lambda rec: rec["emb"])
    a = {"emb": np.array([0.0, 0.0], np.float32)}
    b = {"emb": np.array([3.0, 4.0], np.float32)}
    assert abs(cm.distance(a, b) - 5.0) < 1e-5
    vd = VectorDistance(cm)
    m = vd.batch([a, b], [a, b])
    np.testing.assert_allclose(m, [[0, 5], [5, 0]], atol=1e-5)


def test_node_surface():
    ns = node_surface("cosine")
    a = ("k1", np.array([1.0, 0.0], np.float32))
    b = ("k2", np.array([0.0, 1.0], np.float32))
    assert abs(ns.distance(a, b) - 1.0) < 1e-5
    assert abs(ns.distance(a, a)) < 1e-5
