"""Distance op tests — pin the metric semantics against scipy-free numpy
oracles, mirroring the reference's distance_test.go coverage."""

import numpy as np
import pytest

from hnsw_tpu.ops.distance import (np_pairwise_dist, pairwise_dist,
                                   point_dist, sq_norms)
from tests.conftest import make_vectors


def _ref_cosine(a, b):
    return 1.0 - np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))


@pytest.mark.parametrize("metric", ["cosine", "l2", "sqeuclidean", "dot"])
def test_pairwise_matches_pointwise(metric):
    v = make_vectors(32, 24, seed=1)
    q = make_vectors(5, 24, seed=2)
    d = np.asarray(pairwise_dist(q, v, metric=metric))
    dn = np_pairwise_dist(q, v, metric)
    np.testing.assert_allclose(d, dn, rtol=1e-4, atol=1e-4)
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(
                d[i, j], point_dist(q[i], v[j], metric), rtol=1e-4, atol=1e-4)


def test_cosine_semantics():
    a = np.array([1.0, 0.0, 0.0], np.float32)
    b = np.array([0.0, 1.0, 0.0], np.float32)
    assert abs(point_dist(a, a, "cosine")) < 1e-6
    assert abs(point_dist(a, b, "cosine") - 1.0) < 1e-6
    assert abs(point_dist(a, -a, "cosine") - 2.0) < 1e-6
    va = make_vectors(8, 16, seed=3)
    for i in range(8):
        ref = _ref_cosine(va[0].astype(np.float64), va[i].astype(np.float64))
        assert abs(point_dist(va[0], va[i], "cosine") - ref) < 1e-5


def test_l2_semantics():
    a = np.array([0.0, 0.0], np.float32)
    b = np.array([3.0, 4.0], np.float32)
    assert abs(point_dist(a, b, "l2") - 5.0) < 1e-6
    assert abs(point_dist(a, b, "sqeuclidean") - 25.0) < 1e-6


def test_euclidean_alias():
    v = make_vectors(4, 8)
    d1 = np_pairwise_dist(v, v, "euclidean")
    d2 = np_pairwise_dist(v, v, "l2")
    np.testing.assert_array_equal(d1, d2)


def test_zero_vector_cosine_no_nan():
    # The reference lets zero vectors produce NaN (graph.go:65-66 comment);
    # we deliberately guard with an epsilon so TPU top-k stays well ordered.
    z = np.zeros((1, 4), np.float32)
    v = make_vectors(3, 4)
    d = np.asarray(pairwise_dist(z, v, metric="cosine"))
    assert np.all(np.isfinite(d))


def test_sq_norms():
    v = make_vectors(10, 7)
    np.testing.assert_allclose(np.asarray(sq_norms(v)),
                               np.sum(v * v, axis=1), rtol=1e-5)
