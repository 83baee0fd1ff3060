"""Pallas fused exact kernel — correctness vs the numpy oracle.

Runs in interpreter mode on CPU (tests) and compiled on TPU (bench).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hnsw_tpu.ops.pallas_exact import exact_topk_fused
from hnsw_tpu.ops.topk import np_exact_topk
from tests.conftest import make_vectors


@pytest.mark.parametrize("metric", ["cosine", "l2", "sqeuclidean", "dot"])
def test_fused_matches_oracle(metric):
    n, d, q, k = 300, 32, 20, 10
    v = make_vectors(n, d, seed=110)
    qs = make_vectors(q, d, seed=111)
    sq = np.sum(v * v, axis=1).astype(np.float32)
    dd, ii = exact_topk_fused(qs, v, jnp.asarray(sq),
                              jnp.ones(n, bool), k=k, metric=metric,
                              interpret=True)
    gt_d, gt_i = np_exact_topk(qs, v, k, metric)
    np.testing.assert_array_equal(np.asarray(ii), gt_i)
    np.testing.assert_allclose(np.asarray(dd), gt_d, rtol=1e-4, atol=1e-4)


def test_fused_respects_validity_mask():
    n, d = 64, 16
    v = make_vectors(n, d, seed=112)
    sq = np.sum(v * v, axis=1).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::2] = False
    dd, ii = exact_topk_fused(v[:4], v, jnp.asarray(sq),
                              jnp.asarray(valid), k=5, metric="l2",
                              interpret=True)
    ii = np.asarray(ii)
    assert np.all(ii % 2 == 1)  # only odd (valid) rows returned


def test_fused_k_exceeds_valid_count():
    v = make_vectors(16, 8, seed=113)
    sq = np.sum(v * v, axis=1).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:3] = True
    dd, ii = exact_topk_fused(v[:2], v, jnp.asarray(sq),
                              jnp.asarray(valid), k=8, metric="cosine",
                              interpret=True)
    ii = np.asarray(ii)
    assert set(ii[0][ii[0] >= 0].tolist()) == {0, 1, 2}
    assert np.all(ii[:, 3:] == -1)
