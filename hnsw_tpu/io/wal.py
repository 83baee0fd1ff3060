"""Incremental write-ahead log — parity with parquet/incremental.go.

Change records (Add/Delete with key, vector, timestamp —
incremental.go:37-51) buffer in memory and flush to numbered log files
``vector%06d.<fmt>`` (incremental.go:126-234). Reads overlay
newest-log-first (incremental.go:237-352). ``compact`` merges base +
logs into a rewritten base and deletes the logs (incremental.go:
453-488); ``should_compact`` triggers on log count or age
(incremental.go:812-827). Compaction-on-open mirrors parquet/graph.go:157.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from hnsw_tpu.io import table as T


@dataclasses.dataclass
class Change:
    """incremental.go:37-44."""
    type: str                      # "add" | "delete"
    key: Any
    vector: Optional[np.ndarray]
    timestamp: float


class IncrementalStore:
    """WAL of vector adds/deletes with numbered log files."""

    def __init__(self, directory: str, fmt: str = "parquet",
                 max_changes: int = 1000, max_age_seconds: float = 3600.0,
                 max_log_files: int = 5):
        self.dir = directory
        self.fmt = fmt
        self.max_changes = max_changes
        self.max_age = max_age_seconds
        self.max_log_files = max_log_files
        self.pending: List[Change] = []
        self.oldest_pending: Optional[float] = None
        os.makedirs(directory, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _log_paths(self) -> List[str]:
        pat = os.path.join(self.dir, f"vector*.{T.ext_for(self.fmt)}")
        return sorted(glob.glob(pat))

    def _next_log_path(self) -> str:
        logs = self._log_paths()
        n = 0
        if logs:
            last = os.path.basename(logs[-1]).split(".")[0]
            n = int(last.replace("vector", "")) + 1
        return os.path.join(self.dir,
                            f"vector{n:06d}.{T.ext_for(self.fmt)}")

    # -- buffering ------------------------------------------------------------
    def record_add(self, key: Any, vector: np.ndarray) -> None:
        self.pending.append(Change("add", key,
                                   np.asarray(vector, np.float32),
                                   time.time()))
        self.oldest_pending = self.oldest_pending or self.pending[-1].timestamp
        if len(self.pending) >= self.max_changes:
            self.flush()

    def record_delete(self, key: Any) -> None:
        self.pending.append(Change("delete", key, None, time.time()))
        self.oldest_pending = self.oldest_pending or self.pending[-1].timestamp
        if len(self.pending) >= self.max_changes:
            self.flush()

    def flush(self) -> Optional[str]:
        """Write pending changes to the next numbered log file
        (incremental.go:154-234). Deletes encode as NaN vectors."""
        if not self.pending:
            return None
        dim = next((c.vector.shape[0] for c in self.pending
                    if c.vector is not None), 1)
        keys, vecs = [], []
        for c in self.pending:
            keys.append(c.key)
            if c.type == "add":
                vecs.append(c.vector)
            else:
                vecs.append(np.full((dim,), np.nan, np.float32))
        path = self._next_log_path()
        T.write_vectors(path, keys, np.stack(vecs), self.fmt)
        self.pending.clear()
        self.oldest_pending = None
        return path

    # -- reads (overlay newest-first, incremental.go:237-352) ----------------
    def get_vector(self, key: Any) -> Tuple[bool, Optional[np.ndarray]]:
        """(found, vector|None). found+None means 'deleted here'."""
        for c in reversed(self.pending):
            if c.key == key:
                return True, (c.vector if c.type == "add" else None)
        for path in reversed(self._log_paths()):
            keys, vecs = T.read_vectors(path, self.fmt)
            for i in range(len(keys) - 1, -1, -1):
                if keys[i] == key:
                    v = vecs[i]
                    return True, (None if np.isnan(v).all() else v)
        return False, None

    def overlay(self) -> Dict[Any, Optional[np.ndarray]]:
        """Materialize the full overlay: key -> vector (None=deleted)."""
        out: Dict[Any, Optional[np.ndarray]] = {}
        for path in self._log_paths():                # oldest -> newest
            keys, vecs = T.read_vectors(path, self.fmt)
            for k, v in zip(keys, vecs):
                out[k] = None if np.isnan(v).all() else v
        for c in self.pending:
            out[c.key] = c.vector if c.type == "add" else None
        return out

    # -- compaction (incremental.go:453-488, 812-827) --------------------------
    def should_compact(self) -> bool:
        if len(self._log_paths()) > self.max_log_files:
            return True
        if (self.oldest_pending is not None
                and time.time() - self.oldest_pending > self.max_age):
            return True
        return False

    def compact(self, base_keys: Sequence[Any], base_vectors: np.ndarray
                ) -> Tuple[List[Any], np.ndarray]:
        """Merge base + overlay -> new base; delete all logs. Returns the
        merged (keys, vectors)."""
        self.flush()
        merged: Dict[Any, np.ndarray] = {
            k: v for k, v in zip(base_keys, base_vectors)}
        for k, v in self.overlay().items():
            if v is None:
                merged.pop(k, None)
            else:
                merged[k] = v
        for path in self._log_paths():
            os.unlink(path)
        keys = list(merged.keys())
        if keys:
            vecs = np.stack([merged[k] for k in keys])
        else:
            dim = base_vectors.shape[1] if base_vectors.size else 0
            vecs = np.zeros((0, dim), np.float32)
        return keys, vecs

    @property
    def num_log_files(self) -> int:
        return len(self._log_paths())
