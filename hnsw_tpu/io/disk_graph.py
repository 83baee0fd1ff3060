"""Disk-backed graph — ONE implementation replacing BOTH ParquetGraph
(parquet/graph.go) and ArrowGraph (arrow/graph.go).

The reference grew three HNSW implementations because each storage
backend re-implemented the graph (SURVEY.md §1 note). Here storage is a
parameter: the same core Graph persists to a directory of four tables
(vectors/layers/neighbors/metadata — schemas from parquet/storage.go:
127-168) in Parquet, Arrow IPC, or npz, with an incremental WAL for
vector churn (io/wal.IncrementalStore) and compaction on open
(parquet/graph.go:157).

Unlike the reference's disk graphs, Delete/Add never rewrite all tables
synchronously (the reference rewrites every Parquet file per single
Delete — parquet/graph.go:1115, a quirk SURVEY.md §7.4 says not to
replicate): mutations append WAL records; ``save`` / ``compact`` /
``close`` persist the full structure.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Hashable, List, Optional, Sequence, Tuple

import numpy as np

from hnsw_tpu.config import GraphConfig, StoreConfig
from hnsw_tpu.index.hnsw import Graph
from hnsw_tpu.io import table as T
from hnsw_tpu.io.wal import IncrementalStore


class DiskGraph:
    """Durable Graph bound to a directory of tables + WAL."""

    def __init__(self, directory: str, config: Optional[GraphConfig] = None,
                 store_config: Optional[StoreConfig] = None,
                 fmt: Optional[str] = None):
        self.scfg = store_config or StoreConfig(directory=directory,
                                                format=fmt or "parquet")
        if fmt is not None and self.scfg.format != fmt:
            self.scfg = StoreConfig(**{**self.scfg.__dict__,
                                       "format": fmt})
        self.scfg.validate()
        self.dir = directory
        self.fmt = self.scfg.format
        os.makedirs(directory, exist_ok=True)
        self.wal = IncrementalStore(
            os.path.join(directory, "wal"), fmt=self.fmt,
            max_changes=self.scfg.wal_max_changes,
            max_age_seconds=self.scfg.wal_max_age_seconds,
            max_log_files=self.scfg.wal_max_log_files,
            sync_writes=self.scfg.wal_sync_writes)
        self.graph = self._open(config)
        # Age-based background WAL flush (the reference's 30s flush
        # goroutine — parquet/vector_ops.go:80-95, arrow/vector_store.go:
        # 73-95). Buffered changes older than the interval hit disk even
        # with no further mutations.
        self._stop_flusher = threading.Event()
        self._flusher: Optional[threading.Thread] = None
        interval = self.scfg.wal_flush_interval_seconds
        if interval and interval > 0:
            self._flusher = threading.Thread(
                target=self._flush_loop, args=(interval,), daemon=True,
                name=f"hnsw-wal-flush-{os.path.basename(directory)}")
            self._flusher.start()

    def _flush_loop(self, interval: float) -> None:
        tick = min(interval, 1.0)
        while not self._stop_flusher.wait(tick):
            try:
                self.wal.flush_if_stale(interval)
            except Exception:  # never kill the daemon on a transient IO error
                pass

    # -- file paths ----------------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}.{T.ext_for(self.fmt)}")

    # -- open / load -----------------------------------------------------------
    @staticmethod
    def _overlay_differs(base_keys, base_vecs, keys, vecs) -> bool:
        """True when the merged WAL state differs from the base tables —
        by key set OR by vector values (a flushed update to an existing
        key must trigger a rebuild, not be discarded)."""
        if len(keys) != len(base_keys):
            return True
        base = {k: v for k, v in zip(base_keys, base_vecs)}
        for k, v in zip(keys, vecs):
            b = base.get(k)
            if b is None or not np.array_equal(b, v):
                return True
        return False

    def _open(self, config: Optional[GraphConfig]) -> Graph:
        meta_p = self._p("metadata")
        have_meta = os.path.exists(meta_p)
        meta: dict = {}
        if have_meta:
            meta = T.read_metadata(meta_p, self.fmt)
        cfg = config or (GraphConfig(**meta["config"]) if have_meta
                         else GraphConfig())
        store = None
        if self.scfg.vectors_on_disk:
            from hnsw_tpu.io.mmap_store import MmapVectorStore
            store = MmapVectorStore(os.path.join(self.dir, "vectors_mmap"))
        g = Graph(config=cfg, store=store)
        if self.scfg.hbm_quantized:
            g.hbm_mode = "quantized"
        has_logs = self.wal.num_log_files > 0
        if not have_meta and not has_logs:
            return g
        base_keys, base_vecs = ([], np.zeros((0, 0), np.float32))
        if os.path.exists(self._p("vectors")):
            base_keys, base_vecs = T.read_vectors(self._p("vectors"),
                                                  self.fmt)
        # merge the WAL overlay WITHOUT deleting logs; logs are only
        # discarded after the merged state is durably persisted
        # (compaction-on-open, parquet/graph.go:157 — minus the
        # reference's delete-before-persist ordering hazard)
        keys, vecs = self.wal.merge(base_keys, base_vecs)
        changed = has_logs and self._overlay_differs(base_keys, base_vecs,
                                                     keys, vecs)
        if not changed and os.path.exists(self._p("neighbors")):
            # structure on disk still valid: restore it directly
            if base_keys:
                self._restore_structure(g, base_keys, base_vecs, meta)
            if has_logs:
                self.wal.discard_logs()  # logs held nothing new
        elif keys or has_logs:
            if keys:
                g.build(keys, vecs)
            self._persist(g)
            self.wal.discard_logs()
        return g

    def _restore_structure(self, g: Graph, keys, vecs, meta) -> None:
        for k in keys:
            slot, _ = g.slots.assign(k)
        g.store.put_batch(
            np.asarray([g.slots.slot_of(k) for k in keys], np.int64),
            vecs)
        lids, ekeys, enbrs = T.read_edges(self._p("neighbors"), self.fmt)
        llids, lkeys = T.read_edges(self._p("layers"), self.fmt)[:2]
        n = len(keys)
        L = int(max(lids.max(initial=0), llids.max(initial=0))) + 1
        g.host._ensure(max(n - 1, 0), L - 1)
        levels = {}
        for lid, k in zip(llids, lkeys):
            s = g.slots.slot_of(k)
            levels[s] = max(levels.get(s, 0), int(lid))
        for s, lvl in levels.items():
            g.host.levels[s] = lvl
        rows = {}
        for lid, k, nb in zip(lids, ekeys, enbrs):
            s = g.slots.slot_of(k)
            t = g.slots.slot_of(nb)
            if s is None or t is None:
                continue
            rows.setdefault((int(lid), s), []).append(t)
        for (lid, s), nbrs in rows.items():
            w = min(len(nbrs), g.host.neighbors.shape[2])
            g.host.neighbors[lid, s, :w] = nbrs[:w]
        g.host.count = n
        g.host.entry = int(meta.get("entry", -1))
        g.host.top = int(meta.get("top", L - 1))
        if g.host.entry < 0 or g.host.levels[g.host.entry] < 0:
            g.host._refresh_entry()
        g._dirty = True

    # -- persistence -------------------------------------------------------------
    def _persist(self, g: Optional[Graph] = None) -> None:
        g = g or self.graph
        n = g.slots.capacity_used
        live = [(g.slots.slot_to_key[s], s) for s in range(n)
                if g.slots.slot_to_key[s] is not None]
        keys = [k for k, _ in live]
        slots = np.asarray([s for _, s in live], np.int64)
        vecs = (g.store.vectors[slots] if len(slots)
                else np.zeros((0, g.store.dim or 0), np.float32))
        T.write_vectors(self._p("vectors"), keys, vecs, self.fmt,
                        self.scfg.compression)
        # layers table: (layer_id, key) membership
        lids, lkeys = [], []
        host = g.host
        for k, s in live:
            lvl = int(host.levels[s])
            for l in range(0, max(lvl, 0) + 1):
                lids.append(l)
                lkeys.append(k)
        T.write_edges(self._p("layers"), np.asarray(lids, np.int32),
                      lkeys, lkeys, self.fmt, self.scfg.compression)
        # neighbors table
        elids, ekeys, enbrs = [], [], []
        L = max(host.top + 1, 1)
        slot_to_key = {s: k for k, s in live}
        for l in range(L):
            for k, s in live:
                row = host.neighbors[l, s]
                for nb in row[row >= 0]:
                    nbk = slot_to_key.get(int(nb))
                    if nbk is not None:
                        elids.append(l)
                        ekeys.append(k)
                        enbrs.append(nbk)
        T.write_edges(self._p("neighbors"), np.asarray(elids, np.int32),
                      ekeys, enbrs, self.fmt, self.scfg.compression)
        import dataclasses as _dc
        T.write_metadata(self._p("metadata"), {
            "config": _dc.asdict(g.cfg),
            "entry": int(host.entry),
            "top": int(host.top),
            "count": int(host.count),
            "saved_at": time.time(),
        }, self.fmt)

    # -- public API (mirrors the disk graphs' surface) ----------------------------
    def add(self, key: Hashable, vector) -> None:
        self.graph.add(key, vector)
        self.wal.record_add(key, np.asarray(vector, np.float32))
        if self.wal.should_compact():
            self.compact()

    def batch_add(self, keys: Sequence[Hashable], vectors) -> None:
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        if len(keys) >= 256:
            self.graph.build(list(keys), vectors)
        else:
            self.graph.batch_add(list(keys), vectors)
        for k, v in zip(keys, vectors):
            self.wal.record_add(k, v)
        if self.wal.should_compact():
            self.compact()

    def delete(self, key: Hashable) -> bool:
        ok = self.graph.delete(key)
        if ok:
            self.wal.record_delete(key)
        return ok

    def batch_delete(self, keys: Sequence[Hashable]) -> List[bool]:
        return [self.delete(k) for k in keys]

    def search(self, query, k: int):
        return self.graph.search(query, k)

    def batch_search(self, queries, k: int):
        return self.graph.batch_search(queries, k)

    def __len__(self) -> int:
        return len(self.graph)

    def save(self) -> None:
        """Full structure persist + WAL flush (ArrowGraph.Save,
        arrow/graph.go:355-409)."""
        self._persist()
        self.wal.flush()
        if hasattr(self.graph.store, "flush"):
            self.graph.store.flush()  # msync the mmap store

    def compact(self) -> None:
        """Fold the WAL into the base tables (incremental.go:453-488).
        Persist first, THEN drop the logs — a crash in between leaves
        redundant logs, never lost data."""
        self._persist()
        self.wal.discard_logs()

    def optimize(self) -> None:
        """ArrowIndex.Optimize (arrow/index.go:188): flush + save."""
        self.compact()

    def close(self) -> None:
        self._stop_flusher.set()
        if self._flusher is not None:
            self._flusher.join(timeout=5)
            self._flusher = None
        self.save()

    def stats(self) -> dict:
        """File sizes (arrow/storage.go:182-212 Stats)."""
        out = {}
        for name in ("vectors", "layers", "neighbors", "metadata"):
            p = self._p(name)
            out[name + "_bytes"] = (os.path.getsize(p)
                                    if os.path.exists(p) else 0)
        out["wal_log_files"] = self.wal.num_log_files
        out["count"] = len(self)
        return out
