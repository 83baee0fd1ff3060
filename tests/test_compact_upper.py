"""Compact jagged upper-layer storage (DeviceGraph.nbr_upper as a
tuple + upper_map) — the 8M+ single-chip layout.

The dense split stack [L-1, cap, m] allocates every upper layer at full
capacity although layer l holds only an ml^l fraction of nodes (~5.9 GB
at 8M). The compact layout ranks upper nodes by DESCENDING level so
layer l occupies the prefix [0, U_l) of its own right-sized table.
These tests pin (a) exact search equivalence across all three layouts,
(b) device-build + refine correctness on the compact layout, and
(c) the host sync round-trip."""

import numpy as np
import pytest

from hnsw_tpu import Graph
from hnsw_tpu.ops.topk import np_exact_topk
from tests.conftest import make_vectors


def _recall(keys, gt, k):
    hits = sum(len(set(map(int, keys[i][:k])) & set(map(int, gt[i][:k])))
               for i in range(len(gt)))
    return hits / (len(gt) * k)


def _layouts(g):
    for mode in (False, True, "compact"):
        g.split_layers = mode
        g._dirty = True
        yield mode, g.device_graph()


def test_layouts_identical_results():
    n, d, k = 900, 24, 10
    v = make_vectors(n, d, seed=50)
    q = make_vectors(48, d, seed=51)
    g = Graph(m=8, seed=0)
    g.batch_add(list(range(n)), v)

    outs = {}
    for mode, dev in _layouts(g):
        keys, dists = g.batch_search(q, k, ef=64)
        outs[str(mode)] = (np.asarray(keys), np.asarray(dists))
        if mode == "compact":
            assert isinstance(dev.nbr_upper, tuple)
            assert dev.upper_map is not None
            # level-ranked prefix invariant: layer l's table is sized to
            # its own occupancy (pow2-bucketed), monotone nonincreasing
            sizes = [t.shape[0] for t in dev.nbr_upper]
            assert sizes == sorted(sizes, reverse=True)
    assert (outs["False"][0] == outs["True"][0]).all()
    assert (outs["False"][0] == outs["compact"][0]).all()
    np.testing.assert_allclose(outs["False"][1], outs["compact"][1],
                               rtol=1e-6)


def test_upper_map_consistency():
    n, d = 600, 16
    v = make_vectors(n, d, seed=52)
    g = Graph(m=8, seed=3)
    g.batch_add(list(range(n)), v)
    g.split_layers = "compact"
    g._dirty = True
    dev = g.device_graph()
    if dev.nbr_upper is None:
        pytest.skip("single-layer graph")
    umap = np.asarray(dev.upper_map)
    levels = np.asarray(dev.levels)
    # every node with level >= 1 has a unique compact row; only they do
    ups = np.flatnonzero(levels >= 1)
    assert (umap[ups] >= 0).all()
    assert len(np.unique(umap[ups])) == len(ups)
    assert (umap[np.flatnonzero(levels < 1)] == -1).all()
    # prefix property: rank < U_l iff level >= l
    for lyr in range(1, dev.num_layers):
        u_l = int((levels >= lyr).sum())
        sel = ups[levels[ups] >= lyr]
        assert (umap[sel] < u_l).all()
        # rows beyond each layer's occupancy stay empty
        tab = np.asarray(dev.nbr_upper[lyr - 1])
        assert (tab[u_l:] == -1).all()


def test_device_build_and_refine_compact():
    n, d, k = 1200, 24, 10
    v = make_vectors(n, d, seed=53)
    q = make_vectors(40, d, seed=54)
    _, gt = np_exact_topk(q, v, k, "cosine")

    g = Graph(m=8, seed=0)
    g.build(list(range(n)), v, wave=256, method="device")
    r = _recall(g.batch_search(q, k, ef=80)[0], gt, k)
    assert r >= 0.85, r

    # host sync round-trip: a fresh upload serves identically
    keys_a, _ = g.batch_search(q, k, ef=80)
    g._dirty = True
    keys_b, _ = g.batch_search(q, k, ef=80)
    assert (np.asarray(keys_a) == np.asarray(keys_b)).all()

    g.refine(wave=256)
    r2 = _recall(g.batch_search(q, k, ef=80)[0], gt, k)
    assert r2 >= r - 0.05, (r, r2)


def test_incremental_bulk_insert_onto_existing_graph():
    """Second bulk_insert_device call must respect upper rows written by
    the first (the compact assignment is rebuilt per call)."""
    n1, n2, d, k = 600, 600, 24, 10
    v = make_vectors(n1 + n2, d, seed=55)
    q = make_vectors(40, d, seed=56)
    _, gt = np_exact_topk(q, v, k, "cosine")

    g = Graph(m=8, seed=0)
    g.build(list(range(n1)), v[:n1], wave=256, method="device")
    g.build(list(range(n1, n1 + n2)), v[n1:], wave=256, method="device")
    assert len(g) == n1 + n2
    r = _recall(g.batch_search(q, k, ef=80)[0], gt, k)
    assert r >= 0.85, r


def test_vectorized_level_sampling_matches_sequential_law():
    """bulk_insert_device's one-draw geometric sampler has the exact
    tail law of the sequential while-loop: P(lvl >= k) = ml^k, capped
    at max_level of the insertion-time graph size."""
    import math
    ml = 0.25
    n = 200_000
    rng = np.random.default_rng(9)
    u = np.maximum(rng.random(n), 1e-300)
    geom = np.floor(np.log(u) / math.log(ml)).astype(np.int64)
    cap = 12                      # far above any sampled level here
    lv = np.minimum(geom, cap)
    assert lv.min() >= 0
    for k in (1, 2, 3):
        frac = (lv >= k).mean()
        expect = ml ** k
        sigma = math.sqrt(expect * (1 - expect) / n)
        assert abs(frac - expect) < 5 * sigma, (k, frac, expect)
    # cap honored at tiny graph sizes
    lv0 = np.minimum(geom, 1)
    assert lv0.max() <= 1


def test_compact_layout_after_deletes():
    """Deleted nodes (level -1) drop out of the compact upper ranking;
    search over the re-uploaded compact graph never returns them."""
    n, d, k = 800, 24, 10
    v = make_vectors(n, d, seed=57)
    g = Graph(m=8, seed=0)
    g.batch_add(list(range(n)), v)
    # delete a high-level node specifically (stress the prefix ranking)
    lv = g.host.levels
    hi = int(np.argmax(lv[:n]))
    dead = {hi, 3, 5, 7, 11}
    g.batch_delete(sorted(dead))
    g.split_layers = "compact"
    g._dirty = True
    dev = g.device_graph()
    if dev.upper_map is not None:
        umap = np.asarray(dev.upper_map)
        assert (umap[sorted(dead)] == -1).all()
    keys, _ = g.batch_search(v[:32], k, ef=64)
    flat = {int(kk) for row in keys for kk in row if kk is not None}
    assert not (flat & dead)
    assert g.search(v[20], 1)[0][0] == 20
