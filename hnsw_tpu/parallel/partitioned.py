"""PartitionedGraph — the user-facing multi-device index.

Scale-out story (SURVEY.md §5: "shard the vector matrix and neighbor
tables across devices"): a k-means Partitioner routes vectors to
devices; each device owns an independent HNSW sub-graph over its
partition (the reference's Partitioner idea, hybrid/partitioner.go,
promoted to the device-routing layer); every query searches all
partitions in parallel and a global top-k merges the all-gathered
per-partition candidates (parallel/sharded.partitioned_graph_search).

This is the expert-parallel analogue from SURVEY.md §2.7 — no
transport code, just shard_map + collectives.
"""

from __future__ import annotations

from typing import Any, Hashable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hnsw_tpu.config import GraphConfig
from hnsw_tpu.core.state import DeviceGraph
from hnsw_tpu.index.hnsw import Graph
from hnsw_tpu.index.partitioner import Partitioner
from hnsw_tpu.ops.distance import INF_DIST
from hnsw_tpu.parallel.sharded import default_mesh, partitioned_graph_search


def _pad_graph(g: DeviceGraph, cap: int, L: int) -> DeviceGraph:
    pc = cap - g.cap
    pl_ = L - g.num_layers
    return DeviceGraph(
        vectors=jnp.pad(g.vectors, ((0, pc), (0, 0))),
        sq_norms=jnp.pad(g.sq_norms, (0, pc)),
        neighbors=jnp.pad(g.neighbors, ((0, pl_), (0, pc), (0, 0)),
                          constant_values=-1),
        levels=jnp.pad(g.levels, (0, pc), constant_values=-1),
        alive=jnp.pad(g.alive, (0, pc)),
        entry=g.entry,
    )


class PartitionedGraph:
    """One HNSW sub-graph per mesh device, centroid-routed."""

    def __init__(self, mesh=None, config: Optional[GraphConfig] = None,
                 axis: str = "data"):
        self.mesh = mesh or default_mesh()
        self.axis = axis
        self.n_parts = self.mesh.shape[axis]
        self.cfg = config or GraphConfig()
        self.cfg.validate()
        self.partitioner = Partitioner(self.n_parts,
                                       metric=self.cfg.metric,
                                       seed=self.cfg.seed)
        self.graphs: List[Graph] = [Graph(config=self.cfg)
                                    for _ in range(self.n_parts)]
        for g in self.graphs:
            # the stacked pytree pads/stacks `neighbors` as one dense
            # [L, cap, M] array per partition; keep sub-graphs on the
            # dense layout (partitions are capped small — the split
            # layout's HBM win is a 4M+ single-graph concern)
            g.split_layers = False
        self._stacked = None
        self._cap = 0
        self._dirty = True

    def __len__(self) -> int:
        return sum(len(g) for g in self.graphs)

    # -- mutation -----------------------------------------------------------
    def build(self, keys: Sequence[Hashable], vectors,
              wave: int = 1024) -> None:
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        parts = self.partitioner.batch_assign(keys, vectors)
        groups: List[List[int]] = [[] for _ in range(self.n_parts)]
        for i, p in enumerate(parts):
            groups[p].append(i)
        for p, idxs in enumerate(groups):
            if idxs:
                self.graphs[p].build([keys[i] for i in idxs],
                                     vectors[idxs], wave=wave)
        self._dirty = True

    def add(self, key: Hashable, vector) -> None:
        vector = np.asarray(vector, np.float32)
        p = self.partitioner.assign(key, vector)
        self.graphs[p].add(key, vector)
        self._dirty = True

    def delete(self, key: Hashable) -> bool:
        ok = any([g.delete(key) for g in self.graphs if key in g.slots])
        self.partitioner.remove(key)
        if ok:
            self._dirty = True
        return ok

    # -- device sync ------------------------------------------------------------
    def _sync(self):
        if not self._dirty and self._stacked is not None:
            return self._stacked, self._cap
        devs = [g.device_graph() if len(g) else None for g in self.graphs]
        live = [d for d in devs if d is not None]
        if not live:
            raise RuntimeError("all partitions empty")
        cap = max(d.cap for d in live)
        L = max(d.num_layers for d in live)
        dim = live[0].dim
        M = live[0].m
        empty = DeviceGraph(
            vectors=jnp.zeros((cap, dim), live[0].vectors.dtype),
            sq_norms=jnp.zeros((cap,), jnp.float32),
            neighbors=jnp.full((L, cap, M), -1, jnp.int32),
            levels=jnp.full((cap,), -1, jnp.int32),
            alive=jnp.zeros((cap,), bool),
            entry=jnp.asarray(np.int32(-1)),
        )
        devs = [d if d is not None else empty for d in devs]
        padded = [_pad_graph(d, cap, L) for d in devs]
        self._stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
        self._cap = cap
        self._dirty = False
        return self._stacked, self._cap

    # -- search ---------------------------------------------------------------------
    def batch_search(self, queries, k: int, ef: Optional[int] = None
                     ) -> Tuple[List[List[Any]], np.ndarray]:
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if len(self) == 0:
            qn = queries.shape[0]
            return ([[None] * k for _ in range(qn)],
                    np.full((qn, k), INF_DIST, np.float32))
        ef = ef if ef is not None else self.cfg.ef_search
        stacked, cap = self._sync()
        d, i = partitioned_graph_search(
            stacked, jnp.asarray(queries), k=k, ef=ef,
            metric=self.cfg.metric, max_hops=self.cfg.max_hops,
            mesh=self.mesh, axis=self.axis)
        d = np.asarray(d)
        i = np.asarray(i)
        keys_out: List[List[Any]] = []
        for row in i:
            ks = []
            for x in row:
                if x < 0:
                    ks.append(None)
                    continue
                p, s = divmod(int(x), cap)
                ks.append(self.graphs[p].slots.key_of(s))
            keys_out.append(ks)
        return keys_out, d

    def search(self, query, k: int, ef: Optional[int] = None
               ) -> List[Tuple[Any, float]]:
        keys, d = self.batch_search(np.asarray(query, np.float32)[None],
                                    k, ef)
        return [(kk, float(dd)) for kk, dd in zip(keys[0], d[0])
                if kk is not None]

    def stats(self) -> dict:
        return {
            "partitions": self.n_parts,
            "sizes": [len(g) for g in self.graphs],
            "partitioner": self.partitioner.stats(),
        }
