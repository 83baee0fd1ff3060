"""Hybrid strategy index — capability parity with hybrid/hybrid.go.

Tiered static dispatch (hybrid.go:126-539):
  * dataset small (<= exact_threshold)      -> exact brute force
  * dataset very large (>= partition_size * num_partitions)
                                            -> LSH candidates + re-rank
  * otherwise                               -> HNSW graph

On TPU the "exact" tier is itself a batched MXU scan, so the crossover
points shift upward — thresholds stay configurable with reference
defaults. Deletes fan to every sub-index (hybrid.go:406). The
partitioner routes vectors for stats/rebalancing (hybrid.go:233) and
doubles as the shard-routing layer for multi-device search.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Hashable, List, Optional, Sequence, Tuple

import numpy as np

from hnsw_tpu.config import HybridConfig
from hnsw_tpu.index.exact import ExactIndex
from hnsw_tpu.index.hnsw import Graph
from hnsw_tpu.index.lsh import LSHIndex
from hnsw_tpu.index.partitioner import Partitioner


@dataclasses.dataclass
class IndexStats:
    """hybrid.go:148-154."""
    total_vectors: int = 0
    exact_count: int = 0
    hnsw_count: int = 0
    lsh_count: int = 0
    search_count: int = 0
    last_strategy: str = ""


class HybridIndex:
    """Static-threshold hybrid dispatch (hybrid.go:126)."""

    def __init__(self, config: Optional[HybridConfig] = None, **kw):
        self.cfg = config or HybridConfig(**kw)
        self.cfg.validate()
        self.exact = ExactIndex(metric=self.cfg.metric)
        self.graph = Graph(m=self.cfg.m, ml=self.cfg.ml,
                           ef_search=self.cfg.ef_search,
                           metric=self.cfg.metric, seed=self.cfg.seed)
        self.lsh = LSHIndex(metric=self.cfg.metric,
                            num_tables=self.cfg.num_hash_tables,
                            num_bits=self.cfg.num_hash_bits,
                            seed=self.cfg.seed)
        self.partitioner = Partitioner(self.cfg.num_partitions,
                                       metric=self.cfg.metric,
                                       seed=self.cfg.seed)
        self.ivf = None
        if self.cfg.large_strategy == "ivf":
            from hnsw_tpu.index.ivf import IVFIndex
            self.ivf = IVFIndex(num_partitions=self.cfg.num_partitions,
                                nprobe=self.cfg.ivf_nprobe,
                                metric=self.cfg.metric,
                                seed=self.cfg.seed)
        self.stats = IndexStats()

    # -- sizing tiers ---------------------------------------------------------
    def _lsh_tier(self) -> bool:
        return (len(self) >=
                self.cfg.partition_size * self.cfg.num_partitions)

    def __len__(self) -> int:
        return self.stats.total_vectors

    # -- mutation --------------------------------------------------------------
    def add(self, key: Hashable, vector) -> None:
        self.batch_add([key], np.asarray(vector, np.float32)[None])

    def batch_add(self, keys: Sequence[Hashable], vectors) -> None:
        """Small datasets live in the exact tier; once past the
        threshold everything (incl. the exact tier's contents) migrates
        to HNSW + LSH (hybrid.go:233's Add flow, batched)."""
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        if len(set(keys)) != len(keys):
            # duplicates within one batch are one stored vector, not
            # several (last write wins) — dedup before counting/storing
            order = sorted({k: i for i, k in enumerate(keys)}.values())
            keys = [keys[i] for i in order]
            vectors = vectors[order]
        fresh = sum(1 for k in keys
                    if k not in self.exact.slots
                    and k not in self.graph.slots
                    and k not in self.lsh.slots)
        new_total = self.stats.total_vectors + fresh
        if new_total <= self.cfg.exact_threshold:
            self.exact.batch_add(keys, vectors)
            self.stats.exact_count = len(self.exact)
        else:
            if len(self.exact) > 0:
                # migrate exact tier into the graph tiers
                mig_keys = self.exact.keys()
                mig_vecs = np.stack([self.exact.vector_of(k)
                                     for k in mig_keys])
                self.graph.build(mig_keys, mig_vecs)
                self.lsh.batch_add(mig_keys, mig_vecs)
                self.partitioner.batch_assign(mig_keys, mig_vecs)
                if self.ivf is not None:
                    self.ivf.batch_add(mig_keys, mig_vecs)
                self.exact.batch_delete(mig_keys)
                self.stats.exact_count = 0
            if len(keys) >= 256:
                self.graph.build(list(keys), vectors)
            else:
                self.graph.batch_add(list(keys), vectors)
            self.lsh.batch_add(keys, vectors)
            self.partitioner.batch_assign(keys, vectors)
            if self.ivf is not None:
                self.ivf.batch_add(keys, vectors)
        self.stats.total_vectors = new_total
        self.stats.hnsw_count = len(self.graph)
        self.stats.lsh_count = len(self.lsh)

    def delete(self, key: Hashable) -> bool:
        """Fan to all sub-indexes (hybrid.go:406)."""
        ok = False
        ok |= self.exact.delete(key)
        ok |= self.graph.delete(key)
        ok |= self.lsh.delete(key)
        if self.ivf is not None:
            self.ivf.delete(key)
        self.partitioner.remove(key)
        if ok:
            self.stats.total_vectors -= 1
            self.stats.exact_count = len(self.exact)
            self.stats.hnsw_count = len(self.graph)
            self.stats.lsh_count = len(self.lsh)
        return ok

    def batch_delete(self, keys: Sequence[Hashable]) -> List[bool]:
        return [self.delete(k) for k in keys]

    # -- search ------------------------------------------------------------------
    def _strategy(self) -> str:
        if len(self.exact) > 0:
            return "exact"
        if self._lsh_tier():
            return "lsh"
        return "hnsw"

    def search(self, query, k: int) -> List[Tuple[Any, float]]:
        strat = self._strategy()
        self.stats.search_count += 1
        self.stats.last_strategy = strat
        if strat == "exact":
            return self.exact.search(query, k)
        if strat == "lsh":
            if self.ivf is not None:
                return self.ivf.search(query, k)
            res = self.lsh.search(query, k)
            if len(res) >= k:
                return res
            # fallback: LSH candidates too sparse -> graph (hybrid.go:358)
            return self.graph.search(query, k)
        return self.graph.search(query, k)

    def batch_search(self, queries, k: int
                     ) -> Tuple[List[List[Any]], np.ndarray]:
        strat = self._strategy()
        self.stats.search_count += int(np.atleast_2d(queries).shape[0])
        self.stats.last_strategy = strat
        if strat == "exact":
            return self.exact.batch_search(queries, k)
        if strat == "lsh":
            if self.ivf is not None:
                return self.ivf.batch_search(queries, k)
            return self.lsh.batch_search(queries, k)
        return self.graph.batch_search(queries, k)

    # -- maintenance ----------------------------------------------------------
    def force_rebalance(self) -> int:
        """hybrid.go:526 ForceRebalance."""
        return self.partitioner.rebalance()

    def get_partition_stats(self) -> Dict[str, object]:
        """hybrid.go:517 GetPartitionStats."""
        return self.partitioner.stats()

    def get_stats(self) -> Dict[str, object]:
        return dataclasses.asdict(self.stats)

    def close(self) -> None:
        self.exact.close()
        self.lsh.close()
