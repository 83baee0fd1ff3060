"""Determinism & invariance tests.

The reference's thread-safety storms (graph_test.go:461,
graph_benchmark_test.go:123) defend against data races; the functional
TPU engine replaces them with determinism guarantees (SURVEY.md §4):
identical results across runs, batch compositions, and shardings.
"""

import numpy as np

from hnsw_tpu import Graph
from tests.conftest import make_vectors


def test_search_batch_composition_invariant():
    v = make_vectors(400, 16, seed=100)
    g = Graph(seed=0)
    g.batch_add(list(range(400)), v)
    q = make_vectors(32, 16, seed=101)
    # full batch
    keys_full, d_full = g.batch_search(q, 5, ef=40)
    # singles
    for i in (0, 7, 31):
        keys_one, d_one = g.batch_search(q[i:i + 1], 5, ef=40)
        assert keys_one[0] == keys_full[i]
        np.testing.assert_allclose(d_one[0], d_full[i], rtol=1e-5)
    # shuffled batch
    perm = np.random.default_rng(3).permutation(32)
    keys_p, d_p = g.batch_search(q[perm], 5, ef=40)
    for j, i in enumerate(perm):
        assert keys_p[j] == keys_full[i]


def test_repeated_search_identical():
    v = make_vectors(300, 16, seed=102)
    g = Graph(seed=0)
    g.batch_add(list(range(300)), v)
    q = make_vectors(8, 16, seed=103)
    k1, d1 = g.batch_search(q, 7, ef=30)
    k2, d2 = g.batch_search(q, 7, ef=30)
    assert k1 == k2
    np.testing.assert_array_equal(d1, d2)


def test_bulk_build_deterministic():
    v = make_vectors(500, 16, seed=104)
    g1 = Graph(seed=11)
    g1.build(list(range(500)), v, wave=128)
    g2 = Graph(seed=11)
    g2.build(list(range(500)), v, wave=128)
    np.testing.assert_array_equal(g1.host.neighbors, g2.host.neighbors)
    np.testing.assert_array_equal(g1.host.levels, g2.host.levels)
    assert g1.host.entry == g2.host.entry


def test_mixed_ops_stay_consistent():
    # add/delete/search interleaving (the reference's mixed-op fuzz,
    # deterministic here)
    rng = np.random.default_rng(105)
    v = rng.standard_normal((600, 12)).astype(np.float32)
    g = Graph(seed=0)
    live = set()
    for i in range(300):
        g.add(i, v[i])
        live.add(i)
    for step in range(150):
        op = step % 5
        if op in (0, 1) and len(live) < 600:
            nxt = max(live) + 1 if live else 0
            if nxt < 600:
                g.add(nxt, v[nxt])
                live.add(nxt)
        elif op == 2 and len(live) > 10:
            victim = min(live)
            assert g.delete(victim)
            live.discard(victim)
        else:
            q = rng.standard_normal(12).astype(np.float32)
            res = g.search(q, 5)
            assert all(k in live for k, _ in res)
    assert len(g) == len(live)
