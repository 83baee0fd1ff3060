"""Query telemetry — parity with the reference's per-query metrics
window (hybrid/adaptive.go:17-45, 244-313): sliding window of
QueryMetrics, per-strategy aggregates with P95, exposed as nested
dicts like GetStats (adaptive.go:436-469).

Host-side and synchronous: the reference records on a detached
goroutine (adaptive_hybrid.go:275); recording here is a few dict ops,
so we just do it inline — no async machinery to go wrong.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Deque, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class DistanceStats:
    """adaptive.go:31-38."""
    min: float = 0.0
    max: float = 0.0
    mean: float = 0.0
    variance: float = 0.0

    @classmethod
    def from_distances(cls, dists) -> "DistanceStats":
        d = np.asarray([x for x in np.ravel(dists) if np.isfinite(x)])
        if d.size == 0:
            return cls()
        return cls(min=float(d.min()), max=float(d.max()),
                   mean=float(d.mean()), variance=float(d.var()))


@dataclasses.dataclass
class QueryMetrics:
    """adaptive.go:17-29."""
    strategy: str
    duration_s: float
    result_count: int
    #: None = not measured (distinct from a MEASURED 0.0 — a tier that
    #: returns fully disjoint keys must be able to record it)
    recall: Optional[float] = None
    success: bool = True
    distance_stats: Optional[DistanceStats] = None
    timestamp: float = dataclasses.field(default_factory=time.time)


class StrategyStats:
    """Per-strategy aggregate with P95 over a sliding window
    (adaptive.go:274-313)."""

    def __init__(self, window_size: int = 100):
        self.window: Deque[QueryMetrics] = deque(maxlen=window_size)

    def record(self, m: QueryMetrics) -> None:
        self.window.append(m)

    @property
    def count(self) -> int:
        return len(self.window)

    def avg_latency(self) -> float:
        if not self.window:
            return 0.0
        return float(np.mean([m.duration_s for m in self.window]))

    def p95_latency(self) -> float:
        if not self.window:
            return 0.0
        lat = sorted(m.duration_s for m in self.window)
        idx = min(len(lat) - 1, int(0.95 * len(lat)))
        return float(lat[idx])

    def avg_recall(self) -> Optional[float]:
        """Mean over MEASURED recalls (None entries are unprobed, not
        zero); None when nothing was ever measured."""
        vals = [m.recall for m in self.window if m.recall is not None]
        return float(np.mean(vals)) if vals else None

    def success_rate(self) -> float:
        if not self.window:
            return 1.0
        return float(np.mean([1.0 if m.success else 0.0
                              for m in self.window]))

    def as_dict(self) -> Dict[str, float]:
        return {
            "count": self.count,
            "avg_latency_s": self.avg_latency(),
            "p95_latency_s": self.p95_latency(),
            "avg_recall": self.avg_recall(),
            "success_rate": self.success_rate(),
        }


class MetricsWindow:
    """All-strategy registry (adaptive.go:244 RecordQueryMetrics)."""

    def __init__(self, window_size: int = 100):
        self.window_size = window_size
        self.by_strategy: Dict[str, StrategyStats] = {}
        self.total = 0

    def record(self, m: QueryMetrics) -> None:
        self.total += 1
        self.by_strategy.setdefault(
            m.strategy, StrategyStats(self.window_size)).record(m)

    def stats(self, strategy: str) -> Optional[StrategyStats]:
        return self.by_strategy.get(strategy)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        out = {s: st.as_dict() for s, st in self.by_strategy.items()}
        out["_total_queries"] = self.total  # type: ignore
        return out
