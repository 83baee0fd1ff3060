"""Core HNSW graph tests.

Mirrors the reference test strategy (SURVEY.md §4): seeded determinism,
recall vs exact ground truth (hybrid/benchmark_test.go:273 pattern),
delete-repair connectivity invariants (graph_test.go:135-172), and
config validation (graph_test.go:415-459).
"""

import numpy as np
import pytest

from hnsw_tpu import Graph
from hnsw_tpu.config import GraphConfig
from hnsw_tpu.ops.topk import np_exact_topk
from tests.conftest import make_vectors


def recall_at_k(pred_keys, gt_idx, k):
    hits = 0
    for qi in range(len(gt_idx)):
        want = set(int(x) for x in gt_idx[qi][:k])
        got = set(int(x) for x in pred_keys[qi][:k] if x is not None)
        hits += len(want & got)
    return hits / (len(gt_idx) * k)


def test_insert_and_self_search():
    v = make_vectors(300, 32, seed=10)
    g = Graph(metric="cosine", seed=0)
    g.batch_add(list(range(300)), v)
    assert len(g) == 300
    assert g.dims() == 32
    res = g.search(v[17], 1)
    assert res[0][0] == 17 and res[0][1] < 1e-5


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_recall_vs_exact(metric):
    n, d, k = 600, 32, 10
    v = make_vectors(n, d, seed=11)
    q = make_vectors(50, d, seed=12)
    g = Graph(metric=metric, ef_search=40, seed=0)
    g.batch_add(list(range(n)), v)
    keys, _ = g.batch_search(q, k, ef=80)
    _, gt = np_exact_topk(q, v, k, metric)
    r = recall_at_k(keys, gt, k)
    assert r >= 0.9, f"recall {r} too low for {metric}"


def test_deterministic_given_seed():
    v = make_vectors(200, 16, seed=13)
    g1 = Graph(seed=7)
    g1.batch_add(list(range(200)), v)
    g2 = Graph(seed=7)
    g2.batch_add(list(range(200)), v)
    np.testing.assert_array_equal(g1.host.neighbors, g2.host.neighbors)
    q = make_vectors(5, 16, seed=14)
    k1, d1 = g1.batch_search(q, 5)
    k2, d2 = g2.batch_search(q, 5)
    assert k1 == k2
    np.testing.assert_array_equal(d1, d2)


def test_layer_topography_geometric():
    # Layer sizes should decay roughly geometrically with Ml
    # (analyzer.go:262's ideal; graph_test.go:105-114 pins exact values
    # for Go's RNG — we pin the shape, not the RNG).
    v = make_vectors(512, 8, seed=15)
    g = Graph(seed=0)
    g.batch_add(list(range(512)), v)
    levels = g.host.levels[g.host.levels >= 0]
    sizes = [(levels >= l).sum() for l in range(g.num_layers)]
    assert sizes[0] == 512
    assert all(sizes[i] >= sizes[i + 1] for i in range(len(sizes) - 1))
    assert g.num_layers >= 3
    # layer 1 should hold roughly Ml fraction of nodes
    assert 0.1 < sizes[1] / sizes[0] < 0.45


def test_delete_repairs_connectivity():
    # graph_test.go:135-172: delete every even node; graph keeps serving
    # with reasonable connectivity.
    n = 128
    v = make_vectors(n, 16, seed=16)
    g = Graph(seed=0)
    g.batch_add(list(range(n)), v)
    nb0 = g.host.neighbors[0]
    mean_before = (nb0[g.host.levels >= 0] >= 0).sum(1).mean()
    oks = g.batch_delete(list(range(0, n, 2)))
    assert all(oks)
    assert len(g) == n // 2
    alive = g.host.levels >= 0
    assert alive.sum() == n // 2
    # no dangling edges to deleted slots
    dead = set(np.nonzero(~alive)[0].tolist())
    for layer in range(g.host.neighbors.shape[0]):
        for s in np.nonzero(alive)[0]:
            row = g.host.neighbors[layer, s]
            assert not (set(row[row >= 0].tolist()) & dead)
    mean_after = (nb0[alive] >= 0).sum(1).mean()
    assert mean_after >= 0.5 * mean_before
    # still serves correct results
    res = g.search(v[1], 3)
    assert res[0][0] == 1


def test_delete_entry_point():
    v = make_vectors(50, 8, seed=17)
    g = Graph(seed=0)
    g.batch_add(list(range(50)), v)
    entry_key = g.slots.key_of(g.host.entry)
    assert g.delete(entry_key)
    res = g.search(v[(entry_key + 1) % 50], 1)
    assert res[0][0] == (entry_key + 1) % 50


def test_duplicate_key_replaces():
    g = Graph(seed=0)
    r = np.random.default_rng(3)
    a, b = (r.standard_normal((2, 8)).astype(np.float32))
    g.add("x", a)
    g.add("x", b)
    assert len(g) == 1
    np.testing.assert_array_equal(g.lookup("x"), b)
    assert g.search(b, 1)[0][0] == "x"


def test_lookup_and_missing():
    g = Graph(seed=0)
    g.add(5, np.ones(4, np.float32))
    assert g.lookup(5) is not None
    assert g.lookup(6) is None
    assert not g.delete(6)


def test_config_validation():
    with pytest.raises(ValueError, match="m must be greater than 0"):
        GraphConfig(m=0).validate()
    with pytest.raises(ValueError, match="ml must be in"):
        GraphConfig(ml=0.0).validate()
    with pytest.raises(ValueError, match="ef_search"):
        GraphConfig(ef_search=-1).validate()
    with pytest.raises(ValueError, match="k must be greater"):
        Graph().search(np.ones(4), 0)


def test_negative_example_demotes():
    # negative_test.go:10-146 semantics: dog/cat/bird clusters; a dog
    # negative example must demote dog-like vectors.
    r = np.random.default_rng(20)
    dogs = np.array([1.0, 0.1, 0.0]) + 0.05 * r.standard_normal((5, 3))
    cats = np.array([0.0, 1.0, 0.1]) + 0.05 * r.standard_normal((5, 3))
    birds = np.array([0.1, 0.0, 1.0]) + 0.05 * r.standard_normal((5, 3))
    g = Graph(seed=0, ef_search=30)
    g.batch_add([f"dog{i}" for i in range(5)], dogs.astype(np.float32))
    g.batch_add([f"cat{i}" for i in range(5)], cats.astype(np.float32))
    g.batch_add([f"bird{i}" for i in range(5)], birds.astype(np.float32))
    query = np.array([0.5, 0.5, 0.5], np.float32)
    plain = [k for k, _ in g.search(query, 6)]
    negd = [k for k, _ in g.search_with_negative(
        query, np.array([1.0, 0.1, 0.0], np.float32), 6, 0.8)]
    assert any(k.startswith("dog") for k in plain)
    n_dogs_plain = sum(k.startswith("dog") for k in plain[:3])
    n_dogs_neg = sum(k.startswith("dog") for k in negd[:3])
    assert n_dogs_neg < n_dogs_plain or n_dogs_neg == 0


def test_batch_negatives():
    v = make_vectors(60, 8, seed=21)
    g = Graph(seed=0)
    g.batch_add(list(range(60)), v)
    q = make_vectors(3, 8, seed=22)
    res = g.batch_search_with_negatives(
        q, [v[0:1], v[1:2], np.zeros((0, 8), np.float32)], 5, 0.5)
    assert len(res) == 3
    assert all(len(r) == 5 for r in res)
    # neg weight bounds validated
    with pytest.raises(ValueError, match="negWeight"):
        g.search_with_negatives(q[0], v[0:1], 5, 1.5)


def test_growth_recompile_boundaries():
    # crossing capacity buckets must not corrupt results
    g = Graph(seed=0)
    v = make_vectors(40, 8, seed=23)
    for i in range(40):
        g.add(i, v[i])
        if i in (7, 8, 15, 16, 33):
            res = g.search(v[i], 1)
            assert res[0][0] == i


def test_fast_math_reports_f32_exact_distances():
    # fast_math traverses in bf16 but reported distances (and top-k
    # ordering) are reranked at HIGHEST precision
    import numpy as np
    from hnsw_tpu import Graph
    from hnsw_tpu.ops.distance import np_pairwise_dist
    from tests.conftest import make_vectors
    v = make_vectors(500, 32, seed=140)
    q = make_vectors(8, 32, seed=141)
    g = Graph(seed=0)
    g.batch_add(list(range(500)), v)
    g.fast_math = True
    keys, dists = g.batch_search(q, 5, ef=64)
    for i in range(8):
        for kk, dd in zip(keys[i], dists[i]):
            if kk is None:
                continue
            true_d = np_pairwise_dist(q[i][None], v[kk][None])[0, 0]
            assert abs(dd - true_d) < 1e-4, (kk, dd, true_d)


def test_pivot_entry_mode_recall():
    # entry_mode="pivots": one matmul over a pivot subset replaces the
    # upper-layer descent; recall must track (or beat — multiple entry
    # basins) the classic descent.
    n, d, k = 800, 32, 10
    v = make_vectors(n, d, seed=21)
    q = make_vectors(50, d, seed=22)
    g = Graph(metric="cosine", seed=0)
    g.batch_add(list(range(n)), v)
    keys_desc, _ = g.batch_search(q, k, ef=80)
    g.entry_mode = "pivots"
    keys_piv, dists_piv = g.batch_search(q, k, ef=80)
    _, gt = np_exact_topk(q, v, k, "cosine")
    r_desc = recall_at_k(keys_desc, gt, k)
    r_piv = recall_at_k(keys_piv, gt, k)
    assert r_piv >= r_desc - 0.02, (r_piv, r_desc)
    # self-search still exact
    assert g.search(v[11], 1)[0][0] == 11
    # mutation invalidates the pivot cache
    g.delete(3)
    keys2, _ = g.batch_search(q[:2], k)
    assert 3 not in keys2[0] and 3 not in keys2[1]


def test_block_layout_recall_and_exact_distances():
    # layer-0 neighbor-vector blocks: one contiguous int8 block gather
    # per expanded node. Results stay near the f32 path (f32 rerank of
    # the pool head) and reported distances are exact.
    from hnsw_tpu.ops.distance import np_pairwise_dist
    n, d, k = 800, 32, 10
    v = make_vectors(n, d, seed=31)
    q = make_vectors(50, d, seed=32)
    g = Graph(metric="cosine", seed=0)
    g.batch_add(list(range(n)), v)
    keys_f32, _ = g.batch_search(q, k, ef=80)
    g.block_layout = True
    dev = g.device_graph()
    assert dev.nbr_blocks is not None
    assert dev.nbr_blocks.shape[1] == dev.m
    keys_b, dists_b = g.batch_search(q, k, ef=80)
    _, gt = np_exact_topk(q, v, k, "cosine")
    r_f32 = recall_at_k(keys_f32, gt, k)
    r_b = recall_at_k(keys_b, gt, k)
    assert r_b >= r_f32 - 0.02, (r_b, r_f32)
    for i in range(5):
        for kk, dd in zip(keys_b[i], dists_b[i]):
            if kk is None:
                continue
            true_d = np_pairwise_dist(q[i][None], v[kk][None])[0, 0]
            assert abs(dd - true_d) < 1e-4
    # composes with pivot entry
    g.entry_mode = "pivots"
    keys_bp, _ = g.batch_search(q, k, ef=80)
    assert recall_at_k(keys_bp, gt, k) >= r_f32 - 0.02
    # mutation rebuilds blocks
    g.delete(keys_b[0][0])
    keys2, _ = g.batch_search(q[:1], k)
    assert keys_b[0][0] not in keys2[0]


def test_slotmap_assign_fresh_batch_paths():
    """Bulk assignment fast path (fresh keys, no free slots) and the
    per-key fallback (free slots / duplicates / collisions) agree with
    sequential assign semantics."""
    import numpy as np
    from hnsw_tpu.utils.keystore import SlotMap

    # fast path: empty map
    m = SlotMap()
    s = m.assign_fresh_batch(["a", "b", "c"])
    assert s.tolist() == [0, 1, 2]
    assert m.slot_of("b") == 1

    # fast path again: append-only tail
    s2 = m.assign_fresh_batch(["d", "e"])
    assert s2.tolist() == [3, 4]

    # collision with existing key -> fallback, same slot returned
    s3 = m.assign_fresh_batch(["a", "f"])
    assert s3.tolist() == [0, 5]

    # free-slot reuse -> fallback fills the freed slot
    m.release("b")
    s4 = m.assign_fresh_batch(["g"])
    assert s4.tolist() == [1]
    assert m.key_of(1) == "g"

    # duplicate keys inside the batch -> fallback, last-coherent map
    m2 = SlotMap()
    s5 = m2.assign_fresh_batch(["x", "x", "y"])
    assert s5.tolist() == [0, 0, 1]
    assert len(m2) == 2


def test_calibrate_ef_meets_target_and_caches():
    n, d, k = 1500, 32, 10
    v = make_vectors(n, d, seed=30)
    g = Graph(metric="cosine", ef_search=10, seed=0)
    g.build(list(range(n)), v)
    ef, rec = g.calibrate_ef(0.9, k=k, sample=48, seed=1)
    assert rec >= 0.9, f"calibrated recall {rec} below target"
    assert g.ef_search == ef
    # installed ef serves fresh off-distribution queries near target
    q = make_vectors(64, d, seed=31)
    keys, _ = g.batch_search(q, k)
    from hnsw_tpu.ops.topk import np_exact_topk
    _, gt = np_exact_topk(q, v, k, "cosine")
    served = recall_at_k(keys, gt, k)
    assert served >= 0.75, f"served recall {served} too far below target"
    # second call at the same (k, target) is served from the cache
    calls = {"n": 0}
    orig = g._host_oracle_slots
    g._host_oracle_slots = lambda *a, **kw: (calls.__setitem__("n", calls["n"] + 1) or orig(*a, **kw))
    ef2, _ = g.calibrate_ef(0.9, k=k, sample=48, seed=1)
    assert ef2 == ef and calls["n"] == 0
    g._host_oracle_slots = orig


def test_calibrate_ef_unreachable_target_installs_best():
    n, d = 400, 16
    v = make_vectors(n, d, seed=33)
    g = Graph(metric="l2", seed=0)
    g.build(list(range(n)), v)
    ef, rec = g.calibrate_ef(1.01, k=5, sample=32, ladder=(8, 16))
    assert ef in (8, 16) and 0.0 <= rec < 1.01
    assert g.ef_search == ef


def test_calibrate_ef_on_real_workload_sample():
    """probe_queries calibrates against the caller's real workload —
    the synthesized member-mix probes under-provision adversarial
    (fully random) queries (batch22: 0.9 target -> ef=20 -> served
    0.45 at 10k x 128)."""
    n, d, k = 2000, 64, 10
    v = make_vectors(n, d, seed=40)
    g = Graph(metric="cosine", ef_search=10, seed=0)
    g.build(list(range(n)), v)
    workload = make_vectors(128, d, seed=41)  # off-manifold queries
    ef, rec = g.calibrate_ef(0.9, k=k, probe_queries=workload[:64])
    assert rec >= 0.9
    # the installed ef must serve the REST of the workload near target
    keys, _ = g.batch_search(workload[64:], k)
    from hnsw_tpu.ops.topk import np_exact_topk
    _, gt = np_exact_topk(workload[64:], v, k, "cosine")
    served = recall_at_k(keys, gt, k)
    assert served >= 0.8, f"served {served} far below calibrated 0.9"
    # member-mix calibration on the same graph picks a smaller ef
    g2 = Graph(metric="cosine", ef_search=10, seed=0)
    g2.build(list(range(n)), v)
    ef_mix, _ = g2.calibrate_ef(0.9, k=k)
    assert ef_mix <= ef


def test_build_rejects_bad_descent_dtype():
    import pytest
    rng = np.random.default_rng(0)
    g = Graph(metric="cosine")
    with pytest.raises(ValueError, match="descent_dtype"):
        g.build([0, 1], rng.standard_normal((2, 8)).astype(np.float32),
                descent_dtype="bf16")


def test_hbm_mode_accepts_fp16_spelling():
    g = Graph(metric="cosine")
    g.hbm_mode = "fp16"
    assert g.hbm_mode == "float16"
