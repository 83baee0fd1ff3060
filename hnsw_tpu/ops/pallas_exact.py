"""Pallas fused exact-search kernel.

One kernel computes distances AND maintains the running top-k entirely
on-chip: the [Q, N] score matrix never touches HBM (the XLA path
materializes per-chunk scores and runs a full-width lax.top_k sort,
which dominates exact-search time for small k).

Layout: grid (Q_tiles, N_chunks), N innermost (sequential reduction).
Per step: MXU matmul [TQ, D] x [D, TC] -> VPU metric epilogue ->
PACKED-KEY selection -> merge with the running [TQ, K] accumulator kept
in the output block (revisited across the reduction dimension).

Packed-key selection: bitcast each f32 distance to an order-preserving
int32, clear the low log2(TC) bits, OR in the column id. One [TQ, TC]
int32 tensor then carries BOTH the ranking and the identity, so each
top-k extraction pass is one min-reduce + one masked update (~3 VPU
passes) instead of min + argmin + one-hot-sum (~6) — selection, not the
matmul, bounds this kernel (measured 1M x 128: 26.8k qps selection-bound
vs 17k qps for the XLA scan). The packing costs <= 2^-12 relative
distance precision inside the kernel; exact_topk_fused reranks the
(k+pad)-wide winner pool against the f32 vectors OUTSIDE the kernel, so
reported distances and the final order are f32-exact.

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
_INT32_MIN = np.int32(-2147483648)
_INT32_MAX = np.int32(2147483647)


def _mono_int32(d: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving f32 -> int32 map (finite inputs).

    Non-negative floats keep their bit pattern (already increasing);
    negative floats map to INT32_MIN - bits (mirrors them below zero).
    """
    u = jax.lax.bitcast_convert_type(d, jnp.int32)
    return jnp.where(u >= 0, u, _INT32_MIN - u)


#: int32 keys at or above this are masked / INF_DIST sentinels.
_INVALID_KEY_FLOOR = int(
    np.int32(np.float32(INF_DIST).view(np.int32)) & ~0xFFFF)


def _extract_k_packed(pk: jnp.ndarray, k: int) -> jnp.ndarray:
    """k smallest packed keys per row via k (min + masked-update) passes.

    pk: [TQ, W] int32. Returns [TQ, k] int32, ascending. Equal keys are
    masked together (duplicate ids collapse — harmless: duplicates only
    arise from the merge accumulator re-seeing its own entries).
    UNROLLED python loop: a fori_loop carrying the [TQ, W] working set
    measured 10x slower (Mosaic spills large loop carries); unrolled
    passes fit the 16 MB VMEM scoped stack at tc<=1024.
    """
    out = []
    cur = pk
    for _ in range(k):
        m = jnp.min(cur, axis=1)
        cur = jnp.where(cur == m[:, None], _INT32_MAX, cur)
        out.append(m)
    return jnp.stack(out, axis=1)


def _make_kernel(metric: str, k_sel: int, tc: int, fast_math: bool):
    col_mask = np.int32(tc - 1)
    clear_mask = np.int32(~(tc - 1))

    def kernel(q_ref, v_ref, vsq_ref, valid_ref, outk_ref, outi_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            outk_ref[:] = jnp.full_like(outk_ref, _INT32_MAX)
            outi_ref[:] = jnp.full_like(outi_ref, -1)

        q = q_ref[:]                                  # [TQ, D]
        v = v_ref[:]                                  # [TC, D]
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)  # f32 before cast
        if fast_math:
            # bf16 MXU inputs, f32 accumulation: 2x matmul throughput;
            # the wrapper's f32 rerank restores exact ordering
            q = q.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
        gram = jax.lax.dot_general(
            q, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [TQ, TC]
        vsq = vsq_ref[:]                              # [TC]
        if metric == "dot":
            d = -gram
        elif metric == "cosine":
            d = 1.0 - gram * jax.lax.rsqrt(q_sq * vsq[None, :] + _EPS)
        else:
            d = jnp.maximum(q_sq + vsq[None, :] - 2.0 * gram, 0.0)
            if metric == "l2":
                d = jnp.sqrt(d)
        d = jnp.where(valid_ref[:][None, :], d, INF_DIST)

        tq = d.shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tc), 1)
        pk = (_mono_int32(d) & clear_mask) | cols     # [TQ, TC]

        tile_keys = _extract_k_packed(pk, k_sel)      # [TQ, k_sel]
        tile_ids = (tile_keys & col_mask) + (j * tc)

        # merge with the running accumulator: 2*k_sel-wide extraction;
        # ids recovered by masked max (keys are globally comparable).
        # CAVEAT: two DISTINCT candidates from different tiles can share
        # one packed key (same quantized-distance bucket + same in-tile
        # column); `sel` then masks both in one pass and max(ids) keeps
        # only one — a bounded candidate loss (at most one per exact
        # key collision), absorbed by the caller's k_sel = k+8 margin
        # and the f32 rerank. Accepted: folding a tile-id bit into the
        # key would cost packed-id range for a measure-zero event.
        keys = jnp.concatenate([outk_ref[:], tile_keys], axis=1)
        ids = jnp.concatenate([outi_ref[:], tile_ids], axis=1)
        out_k = []
        out_i = []
        cur = keys
        for _ in range(k_sel):
            m = jnp.min(cur, axis=1)
            sel = cur == m[:, None]
            out_k.append(m)
            out_i.append(jnp.max(jnp.where(sel, ids, -1), axis=1))
            cur = jnp.where(sel, _INT32_MAX, cur)
        outk_ref[:] = jnp.stack(out_k, axis=1)
        outi_ref[:] = jnp.stack(out_i, axis=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k_sel", "metric", "tq", "tc",
                                    "interpret", "fast_math"))
def pallas_exact_screen(queries: jnp.ndarray, vectors: jnp.ndarray,
                        v_sq: jnp.ndarray, valid: jnp.ndarray, *,
                        k_sel: int, metric: str = "cosine", tq: int = 256,
                        tc: int = 1024, interpret: bool = False,
                        fast_math: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused screening pass: (packed keys [Q, k_sel], ids [Q, k_sel]).

    queries [Q, D], vectors [N, D]; Q % tq == 0 and N % tc == 0 (callers
    pad; see exact_topk_fused). k_sel <= 128. Keys >= _INVALID_KEY_FLOOR
    mark masked rows. Key order is distance order quantized to the low
    log2(tc) mantissa bits — callers rerank in f32.
    """
    metric = canonical_metric(metric)
    if k_sel > 128:
        raise ValueError("pallas_exact_screen supports k_sel <= 128")
    if tc & (tc - 1):
        raise ValueError("tc must be a power of two (key packing)")
    Q, D = queries.shape
    N = vectors.shape[0]
    assert Q % tq == 0 and N % tc == 0, (Q, N, tq, tc)
    grid = (Q // tq, N // tc)
    kernel = _make_kernel(metric, k_sel, tc, fast_math)
    out_k, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tc, D), lambda i, j: (j, 0)),
            pl.BlockSpec((tc,), lambda i, j: (j,)),
            pl.BlockSpec((tc,), lambda i, j: (j,)),
        ],
        out_specs=[
            pl.BlockSpec((tq, k_sel), lambda i, j: (i, 0)),
            pl.BlockSpec((tq, k_sel), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, k_sel), jnp.int32),
            jax.ShapeDtypeStruct((Q, k_sel), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(queries.astype(jnp.float32), vectors.astype(jnp.float32),
      v_sq.astype(jnp.float32), valid)
    return out_k, out_i


def exact_topk_fused(queries, vectors, v_sq, valid, *, k: int,
                     metric: str = "cosine", interpret: bool = False,
                     fast_math: bool = False):
    """Fused exact k-NN: Pallas screening + f32 rerank of the winners.

    Mirrors ops/topk.exact_topk's signature; returns (dists [Q, k],
    idx [Q, k]) with f32-exact distances and ordering (the packed-key
    screen extracts k+pad candidates; the true top-k survives the
    <= 2^-12 relative key quantization with that margin). k <= 120.
    """
    metric = canonical_metric(metric)
    queries = jnp.asarray(queries, jnp.float32)
    vectors = jnp.asarray(vectors)
    Q, D = queries.shape
    N = vectors.shape[0]
    k_sel = min(min(k + 8, 128), N)
    tq = 256 if Q >= 256 else max(8, Q)
    # tc=1024: [TQ, TC] kernel buffers must fit the ~16 MB VMEM scoped
    # stack (tc=2048 measured 18-20 MB and failed to compile at 1M)
    tc = 1024 if N >= 1024 else max(128, int(2 ** np.ceil(np.log2(N))))
    qp = (-Q) % tq
    np_ = (-N) % tc
    if qp:
        queries_p = jnp.pad(queries, ((0, qp), (0, 0)))
    else:
        queries_p = queries
    if np_:
        vectors_p = jnp.pad(vectors, ((0, np_), (0, 0)))
        v_sq_p = jnp.pad(v_sq, (0, np_))
        valid_p = jnp.pad(valid, (0, np_), constant_values=False)
    else:
        vectors_p, v_sq_p, valid_p = vectors, v_sq, valid
    keys, ids = pallas_exact_screen(queries_p, vectors_p, v_sq_p, valid_p,
                                    k_sel=k_sel, metric=metric, tq=tq,
                                    tc=tc, interpret=interpret,
                                    fast_math=fast_math)
    keys, ids = keys[:Q], ids[:Q]
    ok = (keys < _INVALID_KEY_FLOOR) & (ids >= 0)

    # f32 rerank of the k_sel-wide pool (exact reported distances)
    from hnsw_tpu.ops.distance import gathered_dist
    safe = jnp.clip(ids, 0, N - 1)
    cv = vectors[safe].astype(jnp.float32)              # [Q, k_sel, D]
    csq = v_sq[safe]
    q_sq = jnp.sum(queries * queries, axis=-1)
    d = gathered_dist(queries, cv, csq, q_sq, metric=metric,
                      precision=jax.lax.Precision.HIGHEST)
    d = jnp.where(ok, d, INF_DIST)
    kk = min(k, d.shape[1])
    neg, pos = jax.lax.top_k(-d, kk)
    dk = -neg
    ik = jnp.take_along_axis(ids, pos, axis=1)
    if k > kk:
        dk = jnp.pad(dk, ((0, 0), (0, k - kk)), constant_values=INF_DIST)
        ik = jnp.pad(ik, ((0, 0), (0, k - kk)), constant_values=-1)
    ik = jnp.where(dk >= INF_DIST, -1, ik)
    return dk, ik
