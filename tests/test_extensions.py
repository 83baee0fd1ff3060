"""Facets, metadata, analyzer, and checkpoint codec tests."""

import json
import os

import numpy as np
import pytest

from hnsw_tpu import Graph
from hnsw_tpu.analyzer import Analyzer
from hnsw_tpu.facets import (EqualityFilter, Facet, FacetedGraph,
                             MemoryFacetStore, RangeFilter,
                             StringContainsFilter)
from hnsw_tpu.io.codec import SavedGraph, load_graph, save_graph
from hnsw_tpu.meta import MemoryMetadataStore, MetadataGraph
from tests.conftest import make_vectors


# ---------------------------------------------------------------- facets

def _faceted(n=60, d=8):
    v = make_vectors(n, d, seed=50)
    fg = FacetedGraph(Graph(seed=0))
    for i in range(n):
        fg.add(i, v[i], [
            Facet("category", "red" if i % 2 == 0 else "blue"),
            Facet("price", float(i)),
            Facet("title", f"item number {i}"),
        ])
    return fg, v


def test_faceted_equality_filter():
    fg, v = _faceted()
    res = fg.search(v[10], 5, [EqualityFilter("category", "red")])
    assert len(res) == 5
    assert all(int(k) % 2 == 0 for k, _ in res)
    assert res[0][0] == 10  # self passes filter (10 is red)
    # distances sorted ascending
    dists = [d for _, d in res]
    assert dists == sorted(dists)


def test_faceted_range_and_contains():
    fg, v = _faceted()
    res = fg.search(v[3], 5, [RangeFilter("price", min=20, max=40)])
    assert all(20 <= int(k) <= 40 for k, _ in res)
    res = fg.search(v[3], 3, [StringContainsFilter("title", "NUMBER 7")])
    assert all("7" in str(k) for k, _ in res)


def test_faceted_shortfall_requery():
    fg, v = _faceted()
    # selective filter triggers the widening re-query; the query IS a
    # matching node so at least it must be found
    res = fg.search(v[41], 5, [RangeFilter("price", min=40, max=44)])
    assert res and res[0][0] == 41
    assert all(40 <= int(k) <= 44 for k, _ in res)
    # filter rejecting everything -> empty, no crash
    assert fg.search(v[0], 3, [EqualityFilter("category", "green")]) == []


def test_faceted_rollback_on_store_failure():
    class FailingStore(MemoryFacetStore):
        def add(self, key, facets):
            raise RuntimeError("boom")

    fg = FacetedGraph(Graph(seed=0), FailingStore())
    with pytest.raises(RuntimeError):
        fg.add(1, np.ones(4, np.float32), [Facet("a", 1)])
    assert len(fg.graph) == 0


def test_facet_aggregations():
    fg, v = _faceted()
    agg = fg.facet_aggregations(v[0], 10, ["category"])
    assert set(agg) == {"category"}
    assert sum(agg["category"].values()) == 10


def test_batch_faceted_search():
    fg, v = _faceted()
    res = fg.batch_search(v[:3], 4, [EqualityFilter("category", "blue")])
    assert len(res) == 3
    for row in res:
        assert all(int(k) % 2 == 1 for k, _ in row)


# ---------------------------------------------------------------- meta

def test_metadata_round_trip():
    v = make_vectors(30, 8, seed=51)
    mg = MetadataGraph(Graph(seed=0))
    for i in range(30):
        mg.add(i, v[i], {"idx": i, "name": f"node{i}"})
    rec = mg.get(7)
    assert rec["metadata"]["name"] == "node7"
    np.testing.assert_array_equal(rec["vector"], v[7])
    res = mg.search(v[7], 3)
    assert res[0]["key"] == 7
    assert res[0]["metadata"]["idx"] == 7
    # real distances, not the reference's Dist:0 placeholder
    assert res[0]["dist"] < 1e-5
    assert res[1]["dist"] > 0


def test_metadata_json_string_and_invalid():
    mg = MetadataGraph(Graph(seed=0))
    mg.add(1, np.ones(4, np.float32), '{"a": 1}')
    assert mg.get(1)["metadata"] == {"a": 1}
    with pytest.raises(json.JSONDecodeError):
        mg.add(2, np.ones(4, np.float32), "{not json")
    assert len(mg) == 1  # rollback: invalid metadata never inserts


def test_metadata_batch_search_attaches():
    v = make_vectors(20, 8, seed=52)
    mg = MetadataGraph(Graph(seed=0))
    mg.batch_add(list(range(20)), v, [{"i": i} for i in range(20)])
    out = mg.batch_search(v[:2], 3)
    assert out[0][0]["metadata"]["i"] == 0
    assert out[1][0]["metadata"]["i"] == 1


# ---------------------------------------------------------------- analyzer

def test_analyzer_metrics():
    v = make_vectors(300, 16, seed=53)
    g = Graph(seed=0)
    g.batch_add(list(range(300)), v)
    a = Analyzer(g)
    assert a.height() == g.num_layers >= 2
    topo = a.topography()
    assert topo[0] == 300
    conn = a.connectivity()
    assert conn[0] > 4
    qm = a.quality_metrics()
    assert qm.node_count == 300
    assert qm.graph_height == a.height()
    assert qm.avg_connectivity > 4
    assert 0 <= qm.layer_balance <= 1


def test_analyzer_empty_graph():
    qm = Analyzer(Graph(seed=0)).quality_metrics()
    assert qm.node_count == 0
    assert qm.graph_height == 0


# ---------------------------------------------------------------- codec

def test_checkpoint_round_trip(tmp_path):
    v = make_vectors(150, 16, seed=54)
    g = Graph(seed=0, metric="l2")
    g.batch_add([f"k{i}" for i in range(150)], v)
    g.delete("k3")
    p = str(tmp_path / "graph.npz")
    save_graph(g, p)
    g2 = load_graph(p)
    assert len(g2) == 149
    assert g2.metric == "l2"
    np.testing.assert_array_equal(g2.lookup("k5"), v[5])
    assert g2.lookup("k3") is None
    # identical structure -> identical search results
    q = make_vectors(5, 16, seed=55)
    k1, d1 = g.batch_search(q, 5)
    k2, d2 = g2.batch_search(q, 5)
    assert k1 == k2
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
    # mutation continues to work after load
    g2.add("new", v[3])
    assert g2.search(v[3], 1)[0][0] == "new"


def test_checkpoint_atomic_replace(tmp_path):
    p = str(tmp_path / "g.npz")
    g = Graph(seed=0)
    g.add(1, np.ones(4, np.float32))
    save_graph(g, p)
    size1 = os.path.getsize(p)
    g.add(2, 2 * np.ones(4, np.float32))
    save_graph(g, p)
    g3 = load_graph(p)
    assert len(g3) == 2
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_checkpoint_unknown_metric_rejected(tmp_path):
    g = Graph(seed=0)
    g.add(1, np.ones(4, np.float32))
    p = str(tmp_path / "g.npz")
    save_graph(g, p)
    # corrupt the stored metric name
    import json as _json
    import numpy as _np
    with _np.load(p) as z:
        data = {k: z[k] for k in z.files}
    cfg = _json.loads(bytes(data["config"].tobytes()).decode())
    cfg["metric"] = "martian"
    data["config"] = _np.frombuffer(_json.dumps(cfg).encode(), dtype=_np.uint8)
    _np.savez(p, **data)
    with pytest.raises(ValueError, match="martian"):
        load_graph(p)


def test_saved_graph_wrapper(tmp_path):
    p = str(tmp_path / "s.npz")
    sg = SavedGraph.load(p)  # missing file -> fresh graph
    assert len(sg.graph) == 0
    sg.graph.add(1, np.ones(4, np.float32))
    sg.save()
    sg2 = SavedGraph.load(p)
    assert len(sg2.graph) == 1


def test_stream_export_import():
    import io as _io
    from hnsw_tpu.io.codec import export_graph, import_graph
    v = make_vectors(60, 8, seed=160)
    g = Graph(seed=0)
    g.batch_add(list(range(60)), v)
    buf = _io.BytesIO()
    export_graph(g, buf)
    buf.seek(0)
    g2 = import_graph(buf)
    assert len(g2) == 60
    assert g2.search(v[9], 1)[0][0] == 9

def test_batch_search_exact_filtered_recall_one():
    """Masked exact scan: recall 1.0 under a SELECTIVE filter where the
    over-fetch pattern misses (the k nearest matching vectors sit far
    outside the top-3k unfiltered candidates)."""
    import numpy as np

    from hnsw_tpu import EqualityFilter, Facet, FacetedGraph, Graph
    from hnsw_tpu.ops.distance import np_pairwise_dist
    from tests.conftest import make_vectors

    n, d, k = 500, 16, 5
    v = make_vectors(n, d, seed=90)
    g = Graph(seed=0)
    fg = FacetedGraph(g)
    # rare bucket: 2% of keys
    fg.batch_add(list(range(n)), v,
                 [[Facet("bucket", 1 if i % 50 == 0 else 0)]
                  for i in range(n)])
    q = make_vectors(8, d, seed=91)
    res = fg.batch_search_exact(q, k, [EqualityFilter("bucket", 1)])
    allowed = np.array([i for i in range(n) if i % 50 == 0])
    dists = np_pairwise_dist(q, v[allowed], "cosine")
    for qi in range(8):
        want = [int(allowed[j]) for j in np.argsort(dists[qi])[:k]]
        got = [key for key, _ in res[qi]]
        assert got == want, (qi, got, want)
    # no filters -> plain exact scan over everything
    res_all = fg.batch_search_exact(q, 1)
    d_all = np_pairwise_dist(q, v, "cosine")
    for qi in range(8):
        assert res_all[qi][0][0] == int(np.argmin(d_all[qi]))
