"""Pallas fused exact-search kernel.

One kernel computes distances AND maintains the running top-k entirely
on-chip: the [Q, N] score matrix never touches HBM (the XLA path
materializes per-chunk scores and runs a full-width lax.top_k sort,
which dominates exact-search time for small k).

Layout: grid (Q_tiles, N_chunks), N innermost (sequential reduction).
Per step: MXU matmul [TQ, D] x [D, TC] -> VPU metric epilogue -> small-k
selection by iterative min-extraction (k passes over the tile — cheap
for the k<=32 regime ANN serving lives in) -> merge with the running
[TQ, K] accumulator kept in the output block (revisited across the
reduction dimension).

This is the role viterin/vek's SIMD assembly plays in the reference
(distance.go:8; SURVEY.md §2.8) — the one place it drops to native —
done the TPU way.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnsw_tpu.config import canonical_metric
from hnsw_tpu.ops.distance import INF_DIST

_EPS = 1e-30


def _tile_topk(scores: jnp.ndarray, col_base: jnp.ndarray, k: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k smallest of a [TQ, TC] tile via k min-extraction passes.
    Returns ([TQ, k] dists, [TQ, k] GLOBAL column ids)."""
    tq, tc = scores.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tc), 1)
    out_d = []
    out_i = []
    cur = scores
    for _ in range(k):
        m = jnp.min(cur, axis=1)                      # [TQ]
        am = jnp.argmin(cur, axis=1).astype(jnp.int32)
        out_d.append(m)
        out_i.append(am + col_base)
        cur = jnp.where(cols == am[:, None], INF_DIST, cur)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def _merge_sorted(d_a, i_a, d_b, i_b, k: int):
    """Merge two [TQ, k] candidate sets -> k smallest (iterative)."""
    d = jnp.concatenate([d_a, d_b], axis=1)           # [TQ, 2k]
    i = jnp.concatenate([i_a, i_b], axis=1)
    tq, w = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, w), 1)
    out_d = []
    out_i = []
    cur = d
    for _ in range(k):
        m = jnp.min(cur, axis=1)
        am = jnp.argmin(cur, axis=1).astype(jnp.int32)
        onehot = cols == am[:, None]
        # one-hot select (Mosaic lowers no gathers inside kernels)
        out_d.append(m)
        out_i.append(jnp.sum(jnp.where(onehot, i, 0), axis=1))
        cur = jnp.where(onehot, INF_DIST, cur)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def _make_kernel(metric: str, k: int, tc: int, fast_math: bool = False):
    def kernel(q_ref, v_ref, vsq_ref, valid_ref, outd_ref, outi_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            outd_ref[:] = jnp.full_like(outd_ref, INF_DIST)
            outi_ref[:] = jnp.full_like(outi_ref, -1)

        q = q_ref[:]                                  # [TQ, D]
        v = v_ref[:]                                  # [TC, D]
        if fast_math:
            # bf16 MXU inputs, f32 accumulation: 2x matmul throughput;
            # callers rerank the pool in f32 for exact ordering
            q = q.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
        gram = jax.lax.dot_general(
            q, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [TQ, TC]
        vsq = vsq_ref[:]                              # [TC]
        if metric == "dot":
            d = -gram
        else:
            q_sq = jnp.sum(q * q, axis=1, keepdims=True)
            if metric == "cosine":
                d = 1.0 - gram * jax.lax.rsqrt(
                    q_sq * vsq[None, :] + _EPS)
            else:
                d = jnp.maximum(q_sq + vsq[None, :] - 2.0 * gram, 0.0)
                if metric == "l2":
                    d = jnp.sqrt(d)
        d = jnp.where(valid_ref[:][None, :], d, INF_DIST)

        col_base = (j * tc).astype(jnp.int32)
        td, ti = _tile_topk(d, col_base, k)
        md, mi = _merge_sorted(outd_ref[:], outi_ref[:], td, ti, k)
        outd_ref[:] = md
        outi_ref[:] = mi

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "tq", "tc", "interpret",
                                    "fast_math"))
def pallas_exact_topk(queries: jnp.ndarray, vectors: jnp.ndarray,
                      v_sq: jnp.ndarray, valid: jnp.ndarray, *, k: int,
                      metric: str = "cosine", tq: int = 256,
                      tc: int = 2048, interpret: bool = False,
                      fast_math: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused exact k-NN. queries [Q, D], vectors [N, D]; Q % tq == 0 and
    N % tc == 0 (callers pad; see exact_topk_fused). k <= 128 (the
    min-extraction selection is O(k) VPU passes per tile — above that
    the XLA chunked path wins; ExactIndex routes automatically)."""
    metric = canonical_metric(metric)
    if k > 128:
        raise ValueError("pallas_exact_topk supports k <= 128")
    Q, D = queries.shape
    N = vectors.shape[0]
    assert Q % tq == 0 and N % tc == 0, (Q, N, tq, tc)
    grid = (Q // tq, N // tc)
    kernel = _make_kernel(metric, k, tc, fast_math=fast_math)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tc, D), lambda i, j: (j, 0)),
            pl.BlockSpec((tc,), lambda i, j: (j,)),
            pl.BlockSpec((tc,), lambda i, j: (j,)),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tq, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(queries.astype(jnp.float32), vectors.astype(jnp.float32),
      v_sq.astype(jnp.float32), valid)
    return out_d, out_i


def exact_topk_fused(queries, vectors, v_sq, valid, *, k: int,
                     metric: str = "cosine", interpret: bool = False,
                     fast_math: bool = False):
    """Padding wrapper around pallas_exact_topk; mirrors
    ops/topk.exact_topk's signature. Returns (dists [Q,k], idx [Q,k])."""
    queries = jnp.asarray(queries, jnp.float32)
    vectors = jnp.asarray(vectors)
    Q, D = queries.shape
    N = vectors.shape[0]
    tq = 256 if Q >= 256 else max(8, Q)
    tc = 2048 if N >= 2048 else max(128, N)
    qp = (-Q) % tq
    np_ = (-N) % tc
    if qp:
        queries = jnp.pad(queries, ((0, qp), (0, 0)))
    if np_:
        vectors = jnp.pad(vectors, ((0, np_), (0, 0)))
        v_sq = jnp.pad(v_sq, (0, np_))
        valid = jnp.pad(valid, (0, np_), constant_values=False)
    d, i = pallas_exact_topk(queries, vectors, v_sq, valid, k=k,
                             metric=metric, tq=tq, tc=tc,
                             interpret=interpret, fast_math=fast_math)
    d = d[:Q]
    i = jnp.where(d >= INF_DIST, -1, i[:Q])
    return d, i
