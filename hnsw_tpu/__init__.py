"""hnsw_tpu — a TPU-native vector index & query engine.

A ground-up rebuild of the capabilities of TFMV/hnsw (Go HNSW library)
as a batched, array-based, XLA-compiled engine: the hierarchical graph
lives in HBM as fixed-degree int32 neighbor tables, searches run for
thousands of queries in lockstep, and every distance evaluation is an
MXU matmul.
"""

__version__ = "0.1.0"

from hnsw_tpu.config import (AdaptiveConfig, GraphConfig, HybridConfig,
                             ShardingConfig, StoreConfig)
from hnsw_tpu.index.exact import ExactIndex
from hnsw_tpu.index.hnsw import Graph
